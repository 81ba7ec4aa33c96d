// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-task exact kernels for the iterative graph gates — the
  * sub-cap arm of the size-based switch that q198's coreness peel
  * proved out (13.6 → 1.45 s at sf0.1): below [[GraphLocal.maxEdges]]
  * the whole fixed-round recurrence runs inside ONE `mapPartitions`
  * task (one Spark job) instead of rounds × (join + aggregate +
  * checkpoint) whose SCHEDULING is the measured floor at gate scale
  * (~0.1-0.2 s per job × 4-8 jobs per round). Above the cap the
  * distributed standing-partition loops in [[Features]] run unchanged
  * — they are the 100 TB path, and SCALE.md keeps measuring them via
  * the `graft.graph.localMaxEdges=0` override.
  *
  * Every kernel replays the EXACT integer recurrence of its
  * distributed twin (synchronous rounds, floor division, identical
  * tie-breaks), so the two arms agree bit-for-bit — GraphSpec pins
  * arm equality on the gate graphs. Edges arrive via `coalesce(1)`
  * over the caller's PERSISTED frame (the single task reads cached
  * blocks, never recomputes the corpus-scale derivation), and at the
  * cap (4M edges ≈ 100 MB of arrays) the task sits comfortably inside
  * one executor core's share — the q198/q154 envelope.
  */
object GraphLocal {

  /** Default edge ceiling for the single-task arm — the same 4M-edge
    * envelope as [[Features.CorenessLocalMaxEdges]]; override with
    * `graft.graph.localMaxEdges` (0 forces the distributed loop, the
    * spec/scale-check device).
    */
  val DefaultMaxEdges = 4000000L

  def maxEdges(s: SparkSession): Long =
    s.conf.getOption("graft.graph.localMaxEdges")
      .map(_.toLong).getOrElse(DefaultMaxEdges)

  /** One-job eligibility probe for the single-task arm: edge count ≤
    * `cap` AND no NULLs in `cols`. The tuple encoders the kernels use
    * assert non-null, while the distributed loops are TOTAL on null
    * edges/weights (null arithmetic propagates through join + min and
    * the aggregate skips it) — so a null-carrying frame must take the
    * distributed arm to keep the two arms' domains identical
    * (NullInputSpec fuzzes exactly this). Count + per-column non-null
    * counts ride ONE aggregate on the caller's persisted frame.
    */
  def localArmEligible(e: DataFrame, cap: Long,
      cols: Seq[String]): Boolean = {
    val aggs = count(lit(1)).as("n") +:
      cols.map(c => count(col(c)).as(s"nn_$c"))
    val r = e.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    n <= cap && cols.indices.forall(i => r.getLong(i + 1) == n)
  }

  /** Single-task packed edge feed: deserialize and pack each input
    * partition IN PARALLEL into one flat Long array (stride = column
    * count), then move the packed blobs to one task through a
    * 1-partition exchange. The previous `coalesce(1)` feed collapsed
    * the whole read into the kernel task, which then deserialized
    * millions of tuple rows serially — measured ~1 s of q220's gate
    * time; the packed feed is a 32-way parallel pack plus a ~10-30 MB
    * shuffle of primitive arrays. Kernel arithmetic is input-order
    * independent (min-folds, exact integer sums, label argmins with
    * value tie-breaks), so blob arrival order cannot change results —
    * GraphSpec's arm-equality pins hold.
    */
  private def concatBlobs(blobs: Iterator[Array[Long]]): Array[Long] = {
    val all = blobs.toArray
    val total = all.iterator.map(_.length).sum
    val flat = new Array[Long](total)
    var off = 0
    all.foreach { b =>
      System.arraycopy(b, 0, flat, off, b.length); off += b.length
    }
    flat
  }

  private def packed2[T: org.apache.spark.sql.Encoder](s: SparkSession,
      e: DataFrame)(kernel: Array[Long] => Iterator[T])
      : org.apache.spark.sql.Dataset[T] = {
    import s.implicits._
    e.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuffer[Long]()
        it.foreach { case (u, v) => buf += u; buf += v }
        if (buf.isEmpty) Iterator.empty else Iterator.single(buf.toArray)
      }
      .repartition(1)
      .mapPartitions(blobs => kernel(concatBlobs(blobs)))
  }

  private def packed3[T: org.apache.spark.sql.Encoder](s: SparkSession,
      e: DataFrame)(kernel: Array[Long] => Iterator[T])
      : org.apache.spark.sql.Dataset[T] = {
    import s.implicits._
    e.select(col("u").cast("long"), col("v").cast("long"),
        col("w").cast("long"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuffer[Long]()
        it.foreach { case (u, v, w) => buf += u; buf += v; buf += w }
        if (buf.isEmpty) Iterator.empty else Iterator.single(buf.toArray)
      }
      .repartition(1)
      .mapPartitions(blobs => kernel(concatBlobs(blobs)))
  }

  /** Dense-id CSR over a BIDIRECTED long edge list, built inside the
    * task: original ids remap to [0, n), adjacency is one offset +
    * one neighbor array. Shared by the LPA and BFS kernels.
    */
  private final class Csr(pairs: Array[Long]) { // packed (u,v) pairs
    val idx = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    private var nn = 0
    private def id(x: Long): Int = {
      val got = idx.get(x)
      if (got == null) { idx.put(x, nn); nn += 1; nn - 1 } else got.intValue()
    }
    val m: Int = pairs.length / 2
    val eu = new Array[Int](m); val ev = new Array[Int](m)
    locally {
      var i = 0
      while (i < m) {
        eu(i) = id(pairs(2 * i)); ev(i) = id(pairs(2 * i + 1)); i += 1
      }
    }
    val n: Int = nn
    val orig = new Array[Long](n)
    locally {
      val it = idx.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); orig(e.getValue) = e.getKey }
    }
    // undirected: each input edge lands in both endpoint lists
    val off = new Array[Int](n + 1)
    val adj = new Array[Int](2 * m)
    locally {
      val deg = new Array[Int](n)
      var i = 0
      while (i < m) { deg(eu(i)) += 1; deg(ev(i)) += 1; i += 1 }
      i = 0
      while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
      val cur = java.util.Arrays.copyOf(off, n)
      i = 0
      while (i < m) {
        adj(cur(eu(i))) = ev(i); cur(eu(i)) += 1
        adj(cur(ev(i))) = eu(i); cur(ev(i)) += 1
        i += 1
      }
    }
  }

  /** Synchronous label propagation, the [[Features.labelPropagation]]
    * recurrence in one task: labels seed as node ids; each round every
    * node adopts the most frequent neighbor label, ties to the
    * SMALLEST label (the distributed arm's `min(struct(-cnt, label))`
    * argmin — integer-exact, so the arms agree round for round).
    * Returns (node, community) for every node, sorted by node.
    */
  def lpa(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    import s.implicits._
    packed2(s, edges) { pairs =>
        val g = new Csr(pairs)
        var labels = g.orig.clone()
        var r = 0
        while (r < rounds) {
          val next = new Array[Long](g.n)
          val votes = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
          var v = 0
          while (v < g.n) {
            votes.clear()
            var j = g.off(v)
            var bestLabel = Long.MaxValue; var bestCnt = 0
            while (j < g.off(v + 1)) {
              val l = labels(g.adj(j))
              val c = votes.merge(l, 1, (a, b) => a + b).intValue()
              if (c > bestCnt || (c == bestCnt && l < bestLabel)) {
                bestCnt = c; bestLabel = l
              }
              j += 1
            }
            // every node has ≥1 neighbor (edge-derived), so bestCnt ≥ 1
            next(v) = bestLabel
            v += 1
          }
          labels = next
          r += 1
        }
        val out = new Array[(Long, Long)](g.n)
        var v = 0
        while (v < g.n) { out(v) = (g.orig(v), labels(v)); v += 1 }
        out.sortBy(_._1).iterator
      }
      .toDF("node", "community")
  }

  /** k-round frontier BFS + per-distance histogram — the
    * [[Features.bfsHistogram]] recurrence in one task. Seeds are
    * chosen by `seed` on the ORIGINAL node id (the caller supplies the
    * same predicate its Column form states; GraphSpec pins the arms
    * equal on the gate's mod-97 seed). Returns
    * (dist, n, min_node, max_node) sorted by dist, unreachable = -1.
    */
  def bfs(s: SparkSession, edges: DataFrame, seed: Long => Boolean,
      rounds: Int): DataFrame = {
    import s.implicits._
    packed2(s, edges) { pairs =>
        val g = new Csr(pairs)
        val dist = Array.fill(g.n)(-1L)
        var frontier = new scala.collection.mutable.ArrayBuffer[Int]()
        var v = 0
        while (v < g.n) {
          if (seed(g.orig(v))) { dist(v) = 0L; frontier += v }
          v += 1
        }
        var r = 1
        while (r <= rounds && frontier.nonEmpty) {
          val next = new scala.collection.mutable.ArrayBuffer[Int]()
          frontier.foreach { u =>
            var j = g.off(u)
            while (j < g.off(u + 1)) {
              val w = g.adj(j)
              if (dist(w) < 0) { dist(w) = r.toLong; next += w }
              j += 1
            }
          }
          frontier = next
          r += 1
        }
        // histogram with min/max ORIGINAL-id witnesses per distance
        val agg = new java.util.HashMap[Long, Array[Long]]()
        v = 0
        while (v < g.n) {
          val d = dist(v); val o = g.orig(v)
          val a = agg.computeIfAbsent(d, _ => Array(0L, Long.MaxValue, Long.MinValue))
          a(0) += 1; if (o < a(1)) a(1) = o; if (o > a(2)) a(2) = o
          v += 1
        }
        import scala.jdk.CollectionConverters._
        agg.asScala.iterator
          .map { case (d, a) => (d, a(0), a(1), a(2)) }
          .toArray.sortBy(_._1).iterator
      }
      .toDF("dist", "n", "min_node", "max_node")
  }

  /** k-round synchronous Bellman-Ford — the
    * [[Features.relaxDistances]] recurrence in one task: each round
    * relaxes every directed edge against the PREVIOUS round's
    * distances (double-buffered, so a round never propagates two hops
    * — the arms' round-boundary semantics agree exactly; GraphSpec's
    * two-hop-undercut graph is the pin). Returns (node, dist_cents)
    * for nodes reached within k rounds, sorted by node.
    */
  def sssp(s: SparkSession, wEdges: DataFrame, seed: Long => Boolean,
      rounds: Int): DataFrame = {
    import s.implicits._
    packed3(s, wEdges) { trips =>
        val m = trips.length / 3
        val pairs = new Array[Long](2 * m)
        val ws = new Array[Long](m)
        var i = 0
        while (i < m) {
          pairs(2 * i) = trips(3 * i); pairs(2 * i + 1) = trips(3 * i + 1)
          ws(i) = trips(3 * i + 2); i += 1
        }
        val g = new Csr(pairs) // ids + adjacency offsets (unweighted)
        val INF = Long.MaxValue
        var dist = Array.fill(g.n)(INF)
        var v = 0
        while (v < g.n) { if (seed(g.orig(v))) dist(v) = 0L; v += 1 }
        var r = 0
        while (r < rounds) {
          val next = dist.clone()
          i = 0
          while (i < m) {
            val a = g.eu(i); val b = g.ev(i); val w = ws(i)
            if (dist(a) != INF && dist(a) + w < next(b)) next(b) = dist(a) + w
            if (dist(b) != INF && dist(b) + w < next(a)) next(a) = dist(b) + w
            i += 1
          }
          dist = next
          r += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        v = 0
        while (v < g.n) { if (dist(v) != INF) out += ((g.orig(v), dist(v))); v += 1 }
        out.sortBy(_._1).iterator
      }
      .toDF("node", "dist_cents")
  }

  /** Fixed-point weighted PageRank — the [[Features]] q230 recurrence
    * in one task: per-src shares out of 10⁶ by floor division, rank
    * mass at 10¹², damping r·17 div 20, teleport scale·15 div (100·n),
    * [[Features.GraphRounds]] synchronous rounds — every step the
    * identical integer op sequence, so the arms (and the DuckDB
    * oracle's `//`) agree bit-for-bit. Input is the undirected
    * weighted edge list (u, v, w); returns the top 20 (part,
    * pr_scaled) by rank desc, node asc.
    */
  def pagerank(s: SparkSession, ew: DataFrame, rounds: Int): DataFrame = {
    import s.implicits._
    packed3(s, ew) { trips =>
        val mU = trips.length / 3
        val pairs = new Array[Long](2 * mU)
        val wsB = new Array[Long](mU)
        var i = 0
        while (i < mU) {
          pairs(2 * i) = trips(3 * i); pairs(2 * i + 1) = trips(3 * i + 1)
          wsB(i) = trips(3 * i + 2); i += 1
        }
        val g = new Csr(pairs)
        if (g.n == 0) Iterator.empty
        else {
          // directed both ways with the edge's weight; per-src weight sums
          val sumw = new Array[Long](g.n)
          i = 0
          while (i < mU) {
            sumw(g.eu(i)) += wsB(i); sumw(g.ev(i)) += wsB(i); i += 1
          }
          // share(src→dst) = w·10⁶ div Σw(src), stored per directed edge
          val shareFwd = new Array[Long](mU) // eu → ev
          val shareRev = new Array[Long](mU) // ev → eu
          i = 0
          while (i < mU) {
            shareFwd(i) = wsB(i) * 1000000L / sumw(g.eu(i))
            shareRev(i) = wsB(i) * 1000000L / sumw(g.ev(i))
            i += 1
          }
          val scale = 1000000000000L
          val n = g.n.toLong
          val teleport = scale * 15L / (100L * n)
          var r = Array.fill(g.n)(scale / n)
          var round = 0
          while (round < rounds) {
            val inflow = new Array[Long](g.n)
            i = 0
            while (i < mU) {
              inflow(g.ev(i)) += (r(g.eu(i)) * 17L / 20L) * shareFwd(i) / 1000000L
              inflow(g.eu(i)) += (r(g.ev(i)) * 17L / 20L) * shareRev(i) / 1000000L
              i += 1
            }
            var v = 0
            while (v < g.n) { inflow(v) += teleport; v += 1 }
            r = inflow
            round += 1
          }
          val all = new Array[(Long, Long)](g.n)
          var v = 0
          while (v < g.n) { all(v) = (g.orig(v), r(v)); v += 1 }
          all.sortBy { case (node, rank) => (-rank, node) }
            .iterator.take(20)
        }
      }
      .toDF("part", "pr_scaled")
  }
}
