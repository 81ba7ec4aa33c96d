package graft.lake

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Model-based property test: a random sequence of lake operations
  * (append / merge / update / overwrite / vacuum / compact) runs
  * against both the real MiniLake and a trivial driver-side model
  * (a Map plus a change journal). After every step the lake's snapshot
  * must equal the model's map and the cumulative change feed must
  * equal the journal — catching cross-operation interactions
  * (compaction after merge, vacuum after overwrite, change feeds
  * spanning insertsFromData and rewrite commits) that single-operation
  * specs can't.
  */
class MiniLakeModelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  sealed trait Op
  private case class Append(rows: Map[Long, String]) extends Op
  private case class Merge(ins: Map[Long, String], del: Set[Long]) extends Op
  private case class Update(key: Long, value: String) extends Op
  private case class Overwrite(rows: Map[Long, String]) extends Op
  private case object Vacuum extends Op
  private case object Compact extends Op

  private val kvGen: Gen[(Long, String)] = for {
    k <- Gen.choose(0L, 20L)
    v <- Gen.alphaLowerStr.map(_.take(4))
  } yield (k, v)

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.mapOf(kvGen).map(m => Append(m)),
    4 -> (for {
      ins <- Gen.mapOf(kvGen)
      del <- Gen.listOf(Gen.choose(0L, 20L)).map(_.toSet)
    } yield Merge(ins, del)),
    2 -> kvGen.map { case (k, v) => Update(k, v) },
    1 -> Gen.mapOf(kvGen).map(m => Overwrite(m)),
    1 -> Gen.const(Vacuum),
    1 -> Gen.const(Compact))

  private def df(rows: Map[Long, String]) =
    rows.toSeq.toDF("key", "value")

  test("random op sequences: snapshot == model, change feed == journal") {
    (0 until 4).foreach { run =>
      runFuzz(run, seedBase = 1234L,
        mkTable = d => MiniLake(spark, d), toDf = df)
    }
  }

  test("random op sequences on a value-partitioned table") {
    // same model, but the table carries a derived partition column
    // (part = key % 3) — merge rewrites, compaction, vacuum, and the
    // change feed all run through the `_p_part=` layout, and pruned
    // reads must agree with the filtered model after every sequence
    (0 until 2).foreach { run =>
      val pdf = (rows: Map[Long, String]) =>
        df(rows).withColumn("part",
          org.apache.spark.sql.functions.expr("cast(key % 3 as string)"))
      runFuzz(run, seedBase = 9876L,
        mkTable = d => MiniLake.partitioned(spark, d, Seq("part")),
        toDf = pdf,
        finalCheck = (t, model) => (0L until 3L).foreach { p =>
          val pruned = t.snapshotWhere(m => m("part") == p.toString)
            .select("key", "value").as[(Long, String)].collect().toMap
          assert(pruned === model.filter(_._1 % 3 == p),
            s"pruned partition $p diverged")
        })
    }
  }

  private def runFuzz(run: Int, seedBase: Long,
      mkTable: String => MiniLake,
      toDf: Map[Long, String] => org.apache.spark.sql.DataFrame,
      finalCheck: (MiniLake, Map[Long, String]) => Unit = (_, _) => ())
      : Unit = {
    def df(rows: Map[Long, String]): org.apache.spark.sql.DataFrame =
      toDf(rows)
    locally {
      val ops = Gen.listOfN(10, opGen)
        .pureApply(Gen.Parameters.default, Seed(seedBase + run))
      val dir = Files.createTempDirectory("graft_model").toString + "/t"
      val t = mkTable(dir)
      var model = Map(1L -> "seed")
      t.create(df(model))
      // journal of (change_type, key) multiset across all versions
      val journal = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      journal ++= model.keys.map(("insert", _))

      ops.foreach { op =>
        op match {
          case Append(rows) =>
            // appended PKs may collide with live ones — MiniLake append
            // is file-level (no PK semantics), so restrict to new keys
            // to keep the model a Map (merge covers the collision path)
            val fresh = rows.filter(kv => !model.contains(kv._1))
            if (fresh.nonEmpty) {
              // exercise both append paths (plain and optimistic-
              // concurrency) — they must be observationally identical
              if (fresh.size % 2 == 0) t.appendConcurrent(df(fresh))
              else t.append(df(fresh))
              model ++= fresh
              journal ++= fresh.keys.map(("insert", _))
            }
          case Merge(ins, del) =>
            if (ins.nonEmpty || del.nonEmpty) {
              val delRows = model.view.filterKeys(del).toMap
              t.merge(df(ins), df(delRows.map { case (k, v) => k -> v }),
                Seq("key"))
              // reference semantics: deletes apply first, then inserts
              // of keys absent from the kept set
              model --= delRows.keys
              val inserted = ins.filter(kv => !model.contains(kv._1))
              model ++= inserted
              journal ++= delRows.keys.map(("delete", _))
              journal ++= inserted.keys.map(("insert", _))
            }
          case Update(k, v) =>
            if (model.contains(k)) {
              t.update(org.apache.spark.sql.functions.col("key") === k,
                Map("value" -> org.apache.spark.sql.functions.lit(v)))
              journal += (("update_preimage", k))
              journal += (("update_postimage", k))
              model += (k -> v)
            }
          case Overwrite(rows) =>
            if (rows.nonEmpty) {
              t.overwrite(df(rows))
              journal ++= model.keys.map(("delete", _))
              journal ++= rows.keys.map(("insert", _))
              model = rows
            }
          case Vacuum => t.vacuum(retainMillis = 0L)
          case Compact => t.compactFiles()
        }
        val snap = t.snapshot().select("key", "value")
          .as[(Long, String)].collect().toMap
        assert(snap === model, s"snapshot diverged after $op (run $run)")
      }

      val changes = t.readChanges(0, t.latestVersion)
        .select("_change_type", "key").as[(String, Long)].collect()
      assert(changes.sorted.toSeq === journal.sorted.toSeq,
        s"change feed diverged (run $run)")
      finalCheck(t, model)
      MiniLake.deleteRecursively(dir)
    }
  }
}
