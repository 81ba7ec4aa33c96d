// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SemDeDup (q180) invariants: the keeper rule, cluster/cell geometry,
  * τ-grounding of every prune, and run-to-run determinism — the
  * properties the hash gate relies on but cannot name individually.
  */
class SemDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = Dedup.q180SemDedup(spark, sf).collect().map { r =>
    (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
      r.getAs[Long]("cluster_id"), r.getAs[Double]("cos_centroid"),
      r.getAs[Boolean]("kept"))
  }

  test("every vector is decided exactly once; some are pruned") {
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.length === 500)
    val pruned = rows.count(!_._5)
    assert(pruned > 0, "gate corpus must exercise the prune path")
    // the prune is cluster-bounded: most of the corpus survives
    assert(pruned < rows.length / 10)
  }

  test("exactly one keeper per cluster, and it is the least-prototypical " +
      "member (min centroid-cosine, id tie-break)") {
    rows.groupBy(_._3).foreach { case (cid, members) =>
      val kept = members.filter(_._5)
      assert(kept.length === 1, s"cluster $cid keeper count")
      val expected = members.minBy(m => (m._4, m._1))
      assert(kept.head._1 === expected._1,
        s"cluster $cid kept ${kept.head._1}, expected ${expected._1}")
    }
  }

  test("clusters never cross cells (pairwise pruning stays cluster-local)") {
    rows.groupBy(_._3).foreach { case (cid, members) =>
      assert(members.map(_._2).distinct.length === 1,
        s"cluster $cid spans cells ${members.map(_._2).distinct.toSeq}")
    }
  }

  test("every pruned vector is τ-connected: multi-member clusters are " +
      "connected components of the in-cell cosine-≥τ graph") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorExpressions.cosine_similarity
    // recompute the dup graph independently of the query internals
    val vecs = graft.Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        round(cosine_similarity(col("a.v"), col("b.v")), 6))
      .filter(col("sim") >= Dedup.SemDedupTau)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cellOf(a) == cellOf(b) }
    // union-find over the independently recomputed edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = rows.map(r => r._1 -> find(r._1)).toMap
    rows.foreach { case (id, _, cid, _, _) =>
      assert(cid === expected(id), s"vec $id component")
    }
  }

  test("quantizer bits is the scale knob: more cells collapse the " +
      "in-cell candidate volume, and the keeper invariant holds at " +
      "any granularity") {
    import org.apache.spark.sql.functions._
    def candVolume(bits: Int): Long =
      Dedup.semCells(spark, sf, bits)
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
    val v3 = candVolume(3)
    val v6 = candVolume(6)
    assert(v6 * 2 < v3,
      s"bits 3→6 must at least halve candidates, got $v3 → $v6")
    // the decision machinery is granularity-independent: one keeper
    // per cluster, least-prototypical member wins, at bits=6 too
    val out6 = Dedup.semDedupDecide(spark, sf, 6).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Double]("cos_centroid"), r.getAs[Boolean]("kept"))
    }
    assert(out6.length === 500)
    out6.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._4) === 1, s"cluster $cid keeper count")
      val expected = members.minBy(m => (m._3, m._1))
      assert(members.filter(_._4).head._1 === expected._1)
    }
  }

  test("k-means quantizer slots in: the paper's clusterer through the " +
      "same decision pipeline upholds every invariant (witness gate — " +
      "Lloyd's isn't SQL-exact)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorExpressions.cosine_similarity
    val k = 8
    val cells = Dedup.semCellsKmeans(spark, sf, k)
    // the quantizer actually partitions: multiple cells, ids in [0, k)
    val cellIds = cells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cellIds.length > 1 && cellIds.forall(c => c >= 0 && c < k))
    val out = Dedup.semDedupFrom(spark, cells).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("cluster_id"), r.getAs[Double]("cos_centroid"),
        r.getAs[Boolean]("kept"))
    }
    // same invariant battery the hyperplane gate passes:
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === 500)
    assert(out.count(!_._5) > 0, "k-means corpus must exercise the prune")
    out.groupBy(_._3).foreach { case (cid, members) =>
      assert(members.count(_._5) === 1, s"cluster $cid keeper count")
      val expected = members.minBy(m => (m._4, m._1))
      assert(members.filter(_._5).head._1 === expected._1)
      assert(members.map(_._2).distinct.length === 1,
        s"cluster $cid crosses k-means cells")
    }
    // τ-grounding: clusters are the connected components of the
    // in-cell cosine-≥τ graph, recomputed independently by brute force
    val vecs = graft.Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        round(cosine_similarity(col("a.v"), col("b.v")), 6))
      .filter(col("sim") >= Dedup.SemDedupTau)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cellOf(a) == cellOf(b) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    out.foreach { case (id, _, cid, _, _) =>
      assert(cid === find(id), s"vec $id component under k-means cells")
    }
  }

  test("the decision is deterministic across independent runs") {
    val again = Dedup.q180SemDedup(spark, sf).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("cluster_id"), r.getAs[Double]("cos_centroid"),
        r.getAs[Boolean]("kept"))
    }
    assert(again.toSeq === rows.toSeq)
  }
}
