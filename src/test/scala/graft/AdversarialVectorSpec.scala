// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-embedding totality and containment — the vector analogue of
  * AdversarialTextSpec. At 100 TB a handful of corrupt embeddings
  * (NaN/Inf elements, zero vectors, overflow magnitudes, truncated
  * arrays) is a certainty, and the failure mode is not a crash but a
  * SEMANTIC one: Spark SQL orders NaN above every double and evaluates
  * `NaN >= τ` as TRUE, so one NaN-cosine vector would pass every
  * similarity threshold and merge its entire quantizer cell into a
  * single bogus dup-cluster. These tests pin the fix
  * (cosine_similarity and the semdedup centrality read degenerate
  * inputs as 0.0 — "no similarity evidence") with an INDEPENDENT
  * driver-side IEEE recomputation as the referee.
  */
class AdversarialVectorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val srcDir = "/root/testdata/sf0.001"

  /** Poison corpus: ids ≥ 9000, one per corruption class. The clean
    * 500 vectors ride along untouched.
    */
  private val poison: Seq[(Long, Seq[Float])] = Seq(
    9000L -> Seq.fill(64)(Float.NaN),                        // all-NaN
    9001L -> (Seq.fill(63)(0.1f) :+ Float.NaN),              // one NaN
    9002L -> Seq.fill(64)(0.0f),                             // zero vector
    9003L -> (Seq.fill(63)(0.1f) :+ Float.PositiveInfinity), // +Inf element
    9004L -> (Seq.fill(63)(0.1f) :+ Float.NegativeInfinity), // -Inf element
    // note: float inputs can't overflow a double accumulator (max
    // 3.4e38² × 64 dims ≈ 7e79 ≪ DoubleMax), so huge/denormal floats
    // are LEGITIMATE directions — they test totality, not containment
    9005L -> Seq.fill(64)(1e30f),                            // huge magnitude
    9006L -> Seq.fill(64)(1e-30f),                           // denormal scale
    9007L -> Seq(0.1f, 0.2f, 0.3f))                          // truncated (3 dims)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_advvec").toString
    Files.list(Paths.get(srcDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .filterNot(_.endsWith("embeddings.parquet"))
      .foreach { f =>
        Files.createSymbolicLink(
          Paths.get(d, Paths.get(f).getFileName.toString), Paths.get(f))
      }
    val clean = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val bad = poison.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(null).cast("int"))
      .select(clean.columns.map(col).toSeq: _*)
    // + one 64-dim vector with a NULL component (Seq[Float] can't hold
    // one, so build it in SQL); engine readers surface a null slot as
    // 0.0 — its own defect class in q185
    val badNull = Seq(9008L).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(1, 64), i -> CASE WHEN i = 2" +
          " THEN cast(null as float) ELSE cast(0.1 as float) END)"))
      .withColumn("label", lit(null).cast("int"))
      .select(clean.columns.map(col).toSeq: _*)
    clean.unionByName(bad).unionByName(badNull).coalesce(1)
      .write.parquet(s"$d/tmp_emb")
    val part = Files.list(Paths.get(s"$d/tmp_emb")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(s"$d/embeddings.parquet"))
    d
  }

  private val vectorQueries = Seq(
    "q44_embedding_near_dup", "q45_cosine_topk", "q46_ann_lsh",
    "q55_ann_ivf", "q60_label_centroids", "q77_quantize_int8",
    "q121_pq_quantize", "q155_jl_projection", "q169_maxsim",
    "q180_semdedup", "q184_semdedup_auto", "q185_vector_health",
    "q187_ann_ivf_pq", "q199_ann_index_lifecycle", "q209_kmeans_lloyd",
    "q213_ndcg_at_k")

  test("every vector query is total and deterministic on the poisoned corpus") {
    val failures = vectorQueries.flatMap { name =>
      val fn = SparkEntry.queries(name)
      try {
        val a = fn(spark, dir).collect()
        val b = fn(spark, dir).collect()
        if (a.map(_.toString).toSeq != b.map(_.toString).toSeq)
          Some(s"$name: nondeterministic under poison")
        else None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString.take(120))
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q185 health report counts every injected defect class exactly") {
    val m = SparkEntry.queries("q185_vector_health")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("value")).toMap
    assert(m("n_total") === (500 + poison.size + 1).toDouble)
    assert(m("n_null_embedding") === 0.0)
    assert(m("n_with_nan") === 2.0) // all-NaN + one-NaN
    assert(m("n_with_inf") === 2.0) // +Inf + -Inf elements
    assert(m("n_with_null_component") === 1.0)
    assert(m("n_zero_vector") === 1.0)
    assert(m("n_norm_huge") === 1.0) // the 1e30-magnitude vector
    assert(m("n_distinct_dims") === 2.0) // 64 and the truncated 3
    assert(m("dim_min") === 3.0 && m("dim_max") === 64.0)
  }

  test("exact top-k never reports a non-finite similarity") {
    val sims = SparkEntry.queries("q45_cosine_topk")(spark, dir)
      .select("sim").as[Double].collect()
    assert(sims.forall(java.lang.Double.isFinite), "non-finite sim leaked")
  }

  test("semdedup: corrupt vectors cannot merge clean clusters — " +
      "clustering matches an independent IEEE referee") {
    // referee: driver-side cosine with STRICT IEEE semantics; an edge
    // exists iff the cosine is FINITE and >= τ after the operator's
    // 6-dp round. This is computed without Spark expressions, so the
    // operator can't be judge in its own case.
    // null slots read as 0.0 — exactly what the engine's primitive
    // array readers surface to the cosine expression
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[java.lang.Double](1)
          .map(d => if (d == null) 0.0 else d.doubleValue).toSeq
      }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      // referee mirrors the contract: mismatched dimensionality is NOT
      // comparable (prefix-cosines are arbitrary); NaN for no-edge
      if (a.length != b.length) return Double.NaN
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val out = ops.Dedup.q180SemDedup(spark, dir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("kept"))
    }
    assert(out.length === 500 + poison.size + 1) // + the null-component row
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val ids = out.map(_._1).sorted
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if cellOf(a) == cellOf(b)
      c = cos(vecs(a), vecs(b))
      if java.lang.Double.isFinite(c) &&
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= ops.Dedup.SemDedupTau
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    out.foreach { case (id, _, cid, _) =>
      assert(cid === find(id),
        s"vec $id: operator cluster $cid != referee ${find(id)}")
    }
    // and the poison is contained: a NaN-cosine vector (NaN element,
    // zero norm, Inf element) has NO finite edge to anything, so it
    // must sit in a singleton cluster — before the fix it merged its
    // whole cell
    val clusterOf = out.map(r => r._1 -> r._3).toMap
    Seq(9000L, 9001L, 9002L, 9003L, 9004L).foreach { bad =>
      val mates = out.filter(r => r._3 == clusterOf(bad) && r._1 != bad)
      assert(mates.isEmpty,
        s"corrupt vec $bad merged with ${mates.take(3).map(_._1).toSeq}")
    }
  }
}
