// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact dedup groups identical content under min-doc_id keeper") {
    import org.apache.spark.sql.functions._
    val out = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("keeper"), r.getAs[Long]("n")))
      .toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH candidates include all high-jaccard pairs (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val trueDups = Dedup.q41NgramJaccard(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.6)
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    val candidates = Dedup.q42MinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    // banding (3 bands × 2 rows) catches near-identical pairs with
    // probability 1-(1-j²)³ — ≥ 0.77 at j=0.6; on this corpus every
    // high-jaccard pair must surface
    assert(trueDups.subsetOf(candidates),
      s"missed: ${trueDups -- candidates}")
  }

  test("dedup clusters are the connected components of the pair graph") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Dedup.q42MinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val cluster = Dedup.q57DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cluster.size === 500)
    // every edge's endpoints share a cluster (propagation closed over
    // all edges, transitively)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) === cluster(b), s"pair ($a,$b) split across clusters")
    }
    // the cluster id is the component's minimum member (the keeper)
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
    // docs in no pair are singletons labeled by themselves
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cluster.filterNot { case (d, _) => inPairs(d) }.foreach {
      case (d, cid) => assert(cid === d)
    }
    // driver-side union-find oracle: identical component labeling
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    cluster.foreach { case (d, cid) => assert(find(d) === cid) }
  }

  test("cluster canonical picks the richest member of each multi-doc cluster") {
    val sf = "/root/testdata/sf0.001"
    val labels = Dedup.q57DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val chars = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val expected = labels.groupBy(_._2).filter(_._2.length > 1).map {
      case (cid, members) =>
        val docs = members.map(_._1)
        // richest doc wins; ties break to the lowest doc_id
        val canon = docs.minBy(d => (-chars(d), d))
        cid -> ((canon, chars(canon), docs.length.toLong))
    }
    val got = Dedup.q141ClusterCanonical(spark, sf).collect().map { r =>
      r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("canonical_doc"), r.getAs[Long]("canonical_chars"),
          r.getAs[Long]("n_members")))
    }.toMap
    assert(got === expected)
  }

  test("simhash band width is the candidate-volume scale knob") {
    // 2000 unrelated docs: signatures are ~uniform, so band-bucket
    // collisions are pure occupancy noise — at 32 bits (11-bit bands,
    // 2048 buckets) expected candidates ≈ 3·C(n,2)/2^11 ≈ thousands;
    // at 64 bits (21-bit bands) occupancy drops ~1000× and the
    // candidate list with it. This is the empirical basis for the
    // widthBits ≥ 3·log₂(n) sizing rule in SCALE.md: a fixed width
    // goes quadratic once n outgrows its bucket space (measured
    // sf0.1→sf1: 12.8× wall at 10× docs), a log-scaled width stays
    // linear.
    val rnd = new scala.util.Random(7)
    val docs = (0 until 2000).map { i =>
      (i.toLong, Seq.fill(30)("w" + rnd.nextInt(500000)).mkString(" "))
    }.toDF("doc_id", "text")
    val c32 = Dedup.simhashBandCandidates(docs, 32).count()
    val c64 = Dedup.simhashBandCandidates(docs, 64).count()
    assert(c32 > 100L, s"fixture too sparse to show occupancy ($c32)")
    assert(c64 * 10 < c32,
      s"64-bit bands must collapse candidate volume: $c64 vs $c32")
    // and the FULL 64-bit pair path executes (hamming consumes the
    // packed fingerprint — counting candidates alone would let column
    // pruning skip the packing, which is how an ANSI cast bug hid)
    assert(Dedup.simhashNearDupPairs(docs, 64).count() === 0L)
    // exact duplicates survive any width: hamming 0
    val dup = Seq((9001L, "alpha beta gamma delta"),
      (9002L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Dedup.simhashNearDupPairs(docs.unionByName(dup), 64)
      .filter(org.apache.spark.sql.functions.col("id1") === 9001L &&
        org.apache.spark.sql.functions.col("id2") === 9002L)
      .count() === 1L)
  }

  test("simhash of identical docs is identical") {
    val sf = "/root/testdata/sf0.001"
    val fp = Dedup.q43Simhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(fp.size === 500)
    assert(fp.values.forall(_.length == 16))
    assert(fp.values.forall(_.forall(c => c == '0' || c == '1')))
  }

  // The driver corpus duplicates documents nearly whole, so the q202
  // gate only ever exercises single-island excision; this pins the
  // ≥2-island split, inter-island retention, full excision, and the
  // no-dup passthrough against hand-computed islands.
  test("substring dedup splits islands across a unique gap and retains it") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p1 = (1 to 8).map(i => s"a$i").mkString(" ")   // shared with doc 2
    val p2 = (1 to 8).map(i => s"b$i").mkString(" ")   // shared with doc 3
    val docs = Seq(
      1L -> s"$p1 f1 f2 f3 $p2", // two islands, 3-token gap retained
      2L -> p1,                  // fully excised
      3L -> s"$p2 z1",           // head island, 1-token tail retained
      4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9" // unique: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"),
          r.getAs[Long]("n_islands"), r.getAs[String]("retained_md5"))))
      .toMap
    assert(got(1L) === ((19L, 16L, 2L, md5hex("f1 f2 f3"))))
    assert(got(2L) === ((8L, 8L, 1L, md5hex(""))))
    assert(got(3L) === ((9L, 8L, 1L, md5hex("z1"))))
    assert(got(4L) ===
      ((9L, 0L, 0L, md5hex("u1 u2 u3 u4 u5 u6 u7 u8 u9"))))
  }

  // x01..x10 differ only in two digit chars (all pairwise distances
  // <= 2), so every in-window pair verifies and the pass structure is
  // exactly the rank geometry: fwd ranks follow the names; rev keys
  // "10x".."01x" put x10 FIRST. (x01,x02) is adjacent in both orders
  // -> n_passes=2; (x01,x10) is 9 apart fwd but adjacent rev ->
  // n_passes=1; (x01,x06) is 5 apart in BOTH orders -> missed even at
  // distance 2, the documented blind spot of the method.
  test("sorted neighborhood: both-pass, one-pass, and missed pairs") {
    val names = (1 to 10).map(i => f"x$i%02d").toDF("name")
    val got = Dedup.sortedNeighborhood(names).collect()
      .map(r => (r.getAs[String]("n1"), r.getAs[String]("n2")) ->
        ((r.getAs[Long]("dist"), r.getAs[Long]("n_passes")))).toMap
    assert(got(("x01", "x02")) === ((1L, 2L)))
    assert(got(("x01", "x10")) === ((2L, 1L)))
    assert(!got.contains(("x01", "x06")))
    // symmetric canonicalisation: no (greater, lesser) keys at all
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("sorted neighborhood drops null names instead of crashing") {
    val names = Seq(Some("x01"), None, Some("x02")).toDF("name")
    val got = Dedup.sortedNeighborhood(names).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("x01", "x02")))
  }

  // Touching windows (gap exactly = window width) must coalesce into
  // ONE island — a 16-token shared run is nine overlapping duplicated
  // windows, not nine islands.
  test("substring dedup merges overlapping and touching windows") {
    val run = (1 to 16).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      10L -> s"$run tail1 tail2",
      11L -> run
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_cut"), r.getAs[Long]("n_islands")))).toMap
    assert(got(10L) === ((16L, 1L)))
    assert(got(11L) === ((16L, 1L)))
  }

  // The asymmetric case Jaccard misses by construction: a 12-token
  // passage quoted verbatim inside a much longer page. Jaccard stays
  // far below q41's 0.3 bar (10 common shingles / ~100 union) while
  // containment of the passage in the page is exactly 1.0 — and ONLY
  // that direction fires (the page is not contained in the passage).
  test("q260: a quoted passage is contained in its page, not vice " +
      "versa, and sub-floor snippets never fire") {
    val passage = (1 to 12).map(i => s"tok$i").mkString(" ")
    val page = ((1 to 12).map(i => s"tok$i") ++
      (1 to 90).map(i => s"body$i")).mkString(" ")
    // a 2-word snippet shared everywhere: below ContainmentMinShingles
    val snippet = "tok1 tok2"
    val docs = Seq((1L, passage), (2L, page), (3L, snippet))
      .toDF("doc_id", "text")
    val rows = Dedup.containmentFrom(docs).collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Double]("containment")))
    assert(rows.toSeq === Seq((1L, 2L, 1.0)))
  }
}
