// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property: CDC replay is idempotent — applying any change batch to
  * the target twice yields the same snapshot as applying it once
  * (SURVEY.md §5 [EXT]; the at-least-once safety the reference's
  * design doc relies on). Generated batches, deterministic seeds.
  */
class CdcPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val batchGen: Gen[(List[(Long, String)], List[Long])] = for {
    nIns <- Gen.choose(0, 8)
    insKeys <- Gen.listOfN(nIns, Gen.choose(0L, 15L))
    nDel <- Gen.choose(0, 8)
    delKeys <- Gen.listOfN(nDel, Gen.choose(0L, 15L))
  } yield (insKeys.distinct.map(k => k -> s"v$k"), delKeys.distinct)

  private def sample(seed: Long) =
    batchGen.pureApply(Gen.Parameters.default, Seed(seed))

  test("merge replay is idempotent for arbitrary insert/delete batches") {
    (1 to 12).foreach { trial =>
      val b1 = sample(trial * 2L)
      val b2 = sample(trial * 2L + 1)
      val dir = Files.createTempDirectory("cdcprop").toString + "/t"
      try {
        val t = MiniLake(spark, dir)
        t.create(b1._1.toDF("key", "value"))
        def apply(b: (List[(Long, String)], List[Long])): Unit =
          t.merge(b._1.toDF("key", "value"),
            b._2.map(k => (k, "")).toDF("key", "value"), Seq("key"))

        apply(b2)
        val once = t.snapshot().orderBy("key")
          .as[(Long, String)].collect().toSeq
        apply(b2) // replay the same batch
        val twice = t.snapshot().orderBy("key")
          .as[(Long, String)].collect().toSeq
        assert(twice === once, s"trial $trial: b1=$b1 b2=$b2")
      } finally MiniLake.deleteRecursively(dir)
    }
  }
}
