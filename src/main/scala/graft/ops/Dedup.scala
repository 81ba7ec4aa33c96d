// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Text.{tokens, tokensSql}

/** Deduplication operators for training-data pipelines ([EXT] surface):
  * exact (content-hash groupBy), n-gram Jaccard, MinHash+LSH banding
  * (Broder, "On the resemblance and containment of documents", 1997;
  * banding analysis per Leskovec/Rajaraman/Ullman, Mining of Massive
  * Datasets ch.3), and SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002) — each as an
  * oracle-checked query over `documents`.
  *
  * Scale design:
  *  - exact dedup is a single hash-aggregate on md5(text) — the
  *    canonical 100 TB dedup shape (shuffle keyed on the digest, never
  *    on the text);
  *  - MinHash/LSH reduces the candidate space to band-bucket joins: the
  *    self-join is on (band_index, band_hash), so only genuine
  *    candidates meet — no quadratic pair enumeration;
  *  - n-gram Jaccard joins on shingle (inverted-index join) rather than
  *    crossing documents, and both hash-based variants avoid carrying
  *    document text through the shuffle;
  *  - hashes are md5-hex (lexicographic min == uniform min-hash) so the
  *    DuckDB oracle can reproduce them bit-for-bit.
  */
object Dedup {

  /** Word 3-gram shingles per document, via the codegen'd
    * [[graft.functions.ShingleExpressions.WordNGrams]] kernel (same
    * semantics contract as [[ngramsRaw]]: <3-token documents
    * contribute one whole-document shingle, mirroring the oracle's
    * CASE branch). Earlier rounds used posexplode + window `lead` —
    * codegen'd, but it exchanged the entire token stream keyed on
    * doc_id before shingles existed; the expression keeps shingling
    * inside the scan task (no shuffle), which is the difference
    * between O(corpus) and O(0) network for this stage at 100 TB.
    */
  private def shinglesRaw(df: DataFrame): DataFrame =
    ngramsRaw(df, 3)

  private def shingles(df: DataFrame): DataFrame =
    shinglesRaw(df).distinct()

  private val shinglesSql =
    s"""w AS (SELECT doc_id, $tokensSql AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(CASE WHEN length(ws) >= 3
      |    THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |          for i in generate_series(1, length(ws)-2)]
      |    ELSE [array_to_string(ws, ' ')] END) AS shingle
      | FROM w)""".stripMargin

  /** Exact deduplication: content-hash grouping; keeper = min doc_id. */
  def q40ExactDedup(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"),
        count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  val q40Oracle: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
      | count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY content_hash""".stripMargin

  /** Shingles present in more documents than this carry no near-dup
    * signal (boilerplate headers, ubiquitous phrases) but each one
    * turns into a single hot join key whose posting list explodes
    * quadratically in the inverted-index self-join — one shingle in
    * 1M docs is 10^12 join rows. Capping document frequency bounds
    * every posting list; the jaccard then ranges over the capped
    * shingle set on BOTH sides of the gate (the oracle applies the
    * same cap), and the testdata's max df is 25, far below the cap,
    * so gate results are unchanged.
    */
  val HotShingleMaxDf = 100

  /** n-gram Jaccard near-duplicates via an inverted-index join on
    * shingles: |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.
    */
  def q41NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // join on a 64-bit hash of the shingle, not the string: smaller
    // shuffle rows and cheaper equality at 100 TB (collision odds over
    // the corpus are ~2^-64·n² — far below the oracle's noise floor)
    // no cache: the self-join reuses the shuffle exchange, and pinning
    // the full shingle table for the session would be wrong at scale.
    // Hash BEFORE the per-doc distinct so the dedup shuffle moves
    // 8-byte keys, not shingle strings.
    val sh0 = shinglesRaw(documents(s, dir))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    // document-frequency cap as aggregate + semi-join rather than a
    // count-over-window: partial (map-side) aggregation keeps a hot
    // shingle cheap to COUNT, where a window would buffer its whole
    // partition — the exact blow-up being capped. The join is keyed on
    // shingle like everything downstream, so the exchange is computed
    // once and reused.
    val keep = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= HotShingleMaxDf)
      .select("shingle")
    val sh = sh0.join(keep, Seq("shingle"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.as("na"), col("id1") === col("na.doc_id"))
      .join(sizes.as("nb"), col("id2") === col("nb.doc_id"))
      // filter on the UNROUNDED ratio exactly like the oracle's WHERE
      // clause; rounding happens only in the projection
      .withColumn("jaccard_raw", col("common").cast("double") /
        (col("na.n") + col("nb.n") - col("common")))
      .filter(col("jaccard_raw") >= 0.3)
      .withColumn("jaccard", round(col("jaccard_raw"), 4))
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  val q41Oracle: String =
    s"""WITH $shinglesSql,
      |keep AS (SELECT shingle FROM sh GROUP BY shingle
      |         HAVING count(*) <= $HotShingleMaxDf),
      |shk AS (SELECT doc_id, shingle FROM sh
      |        WHERE shingle IN (SELECT shingle FROM keep)),
      |n AS (SELECT doc_id, count(*) AS n FROM shk GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
      |      FROM shk a JOIN shk b
      |        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT id1, id2,
      | round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) AS jaccard
      |FROM p JOIN n na ON id1 = na.doc_id JOIN n nb ON id2 = nb.doc_id
      |WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.3
      |ORDER BY id1, id2""".stripMargin

  /** Shingle-containment near-dup pairs (q260) — Broder's SECOND
    * resemblance measure: C(A→B) = |S(A)∩S(B)| / |S(A)|, the one
    * Jaccard (q41) systematically misses when sizes are asymmetric —
    * a paragraph quoted inside a 100× longer page has Jaccard ≈ 0.01
    * but containment ≈ 1.0. This is the RefinedWeb/CCNet-style
    * sub-document dedup decision: drop the CONTAINED side, keep the
    * container. Same inverted-index shape and economics as q41 (the
    * only change is the denominator): 8-byte xxhash64 shingle keys on
    * the exchange, document-frequency cap [[HotShingleMaxDf]]
    * bounding every posting list, one unordered pair join then BOTH
    * directions emitted by an explode — never a doc × doc product.
    * The contained side must carry ≥ [[ContainmentMinShingles]]
    * shingles (a 2-shingle snippet "contained" everywhere is noise,
    * and the floor keeps the gate's rows meaningful at every SF).
    */
  val ContainmentMinShingles = 5
  val ContainmentThreshold = 0.9

  def q260Containment(s: SparkSession, dir: String): DataFrame =
    containmentFrom(documents(s, dir))

  /** [[q260Containment]] over an explicit `(doc_id, text)` frame —
    * factored so DedupSpec can pin the asymmetric case Jaccard
    * misses: a short passage verbatim inside a much longer page.
    */
  private[graft] def containmentFrom(docs: DataFrame): DataFrame = {
    val sh0 = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    val keep = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= HotShingleMaxDf)
      .select("shingle")
    val sh = sh0.join(keep, Seq("shingle"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.as("na"), col("id1") === col("na.doc_id"))
      .join(sizes.as("nb"), col("id2") === col("nb.doc_id"))
      .select(col("id1"), col("id2"), col("common"),
        col("na.n").as("n1"), col("nb.n").as("n2"))
    // one unordered pair → both directed candidates; filter on the
    // UNROUNDED ratio exactly like the oracle's WHERE clause
    val directed = pairs.select(explode(array(
      struct(col("id1").as("contained"), col("id2").as("container"),
        col("common"), col("n1").as("n_contained")),
      struct(col("id2").as("contained"), col("id1").as("container"),
        col("common"), col("n2").as("n_contained")))).as("d"))
      .select(col("d.contained"), col("d.container"), col("d.common"),
        col("d.n_contained"))
    directed
      .filter(col("n_contained") >= ContainmentMinShingles &&
        col("common").cast("double") / col("n_contained") >=
          ContainmentThreshold)
      .select(col("contained"), col("container"),
        round(col("common").cast("double") / col("n_contained"), 4)
          .as("containment"))
      .orderBy("contained", "container")
  }

  val q260Oracle: String =
    s"""WITH $shinglesSql,
      |keep AS (SELECT shingle FROM sh GROUP BY shingle
      |         HAVING count(*) <= $HotShingleMaxDf),
      |shk AS (SELECT doc_id, shingle FROM sh
      |        WHERE shingle IN (SELECT shingle FROM keep)),
      |n AS (SELECT doc_id, count(*) AS n FROM shk GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
      |      FROM shk a JOIN shk b
      |        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pp AS (SELECT id1, id2, common, na.n AS n1, nb.n AS n2
      |      FROM p JOIN n na ON id1 = na.doc_id
      |      JOIN n nb ON id2 = nb.doc_id),
      |d AS (SELECT id1 AS contained, id2 AS container, common,
      |        n1 AS n_contained FROM pp
      |      UNION ALL
      |      SELECT id2, id1, common, n2 FROM pp)
      |SELECT contained, container,
      |  round(CAST(common AS DOUBLE) / n_contained, 4) AS containment
      |FROM d
      |WHERE n_contained >= $ContainmentMinShingles
      |  AND CAST(common AS DOUBLE) / n_contained >= $ContainmentThreshold
      |ORDER BY contained, container""".stripMargin

  /** Jaro–Winkler fuzzy matching (q264) over part names — the
    * entity-resolution scorer beside q98's blocked edit distance:
    * head-weighted, transposition-tolerant, the measure record
    * linkage (and q191's Fellegi–Sunter weights) standardizes on.
    * The scorer itself is the codegen'd native Expression
    * [[graft.functions.StringSimilarity.JaroWinkler]] (a UDF here
    * would fall out of whole-stage codegen on the hottest loop of an
    * ER pipeline).
    *
    * Scale shape: TWO-key blocking on (first token, p_size) — the
    * multi-attribute blocking real linkage pipelines use, and the
    * q98/q147 discipline that keeps the candidate join bounded, never
    * an all-pairs product. The per-pair kernel is window-bounded
    * O(len²) on short name strings. Both engines compute their OWN
    * doubles here (DuckDB's built-in is the oracle), so every pair
    * score is 4-dp-ROUNDED and DECIMAL-quantized before the
    * order-independent per-block aggregate — sub-ulp implementation
    * skew cannot reach the hash, and the kernel is verified
    * value-for-value against DuckDB in StringSimilaritySpec.
    */
  def q264JaroWinklerMatch(s: SparkSession, dir: String): DataFrame = {
    val p = part(s, dir).select(col("p_partkey").as("k"),
      col("p_name").as("nm"), col("p_size").as("sz"),
      split(col("p_name"), " ").getItem(0).as("blk"))
    p.as("a").join(p.as("b"),
      col("a.blk") === col("b.blk") && col("a.sz") === col("b.sz") &&
        col("a.k") < col("b.k"))
      .select(col("a.blk").as("blk"),
        round(graft.functions.StringSimilarity.jaro_winkler(
          col("a.nm"), col("b.nm")), 4).as("jw"))
      .groupBy("blk")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("jw").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_jw"),
        min(col("jw")).as("min_jw"), max(col("jw")).as("max_jw"))
      .orderBy("blk")
  }

  val q264Oracle: String =
    """WITH p AS (SELECT p_partkey AS k, p_name AS nm, p_size AS sz,
      |  split_part(p_name, ' ', 1) AS blk FROM part),
      |j AS (SELECT a.blk AS blk,
      |  round(jaro_winkler_similarity(a.nm, b.nm), 4) AS jw
      | FROM p a JOIN p b
      |   ON a.blk = b.blk AND a.sz = b.sz AND a.k < b.k)
      |SELECT blk, count(*) AS n_pairs,
      |  round(CAST(sum(CAST(jw AS DECIMAL(18,4))) AS DOUBLE)
      |    / count(*), 4) AS avg_jw,
      |  min(jw) AS min_jw, max(jw) AS max_jw
      |FROM j GROUP BY blk ORDER BY blk""".stripMargin

  /** MinHash signatures + LSH banding. Each of the 6 hash functions is
    * "min over shingles of md5(seed|shingle)" (lexicographic min of a
    * uniform hex digest == uniform min-hash); signatures fold into 3
    * bands of 2 and candidate pairs are documents sharing any band.
    */
  val MinhashSeeds = 0 until 6

  private def signaturesFor(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    val aggs = MinhashSeeds.map(k =>
      min(md5(concat(lit(s"$k|"), col("shingle")))).as(s"m$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesFor(documents(s, dir))

  /** One (doc_id, band) row per LSH band of the document's signature. */
  private def bandedSignatures(docs: DataFrame): DataFrame =
    signaturesFor(docs).select(col("doc_id"),
      explode(array(
        concat(lit("0:"), col("m0"), col("m1")),
        concat(lit("1:"), col("m2"), col("m3")),
        concat(lit("2:"), col("m4"), col("m5")))).as("band"))

  def q42MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val banded = bandedSignatures(documents(s, dir))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
      .orderBy("id1", "id2")
  }

  val q42Oracle: String =
    s"""WITH $shinglesSql,
      |sig AS (SELECT doc_id,
      |  min(md5('0|' || shingle)) AS m0, min(md5('1|' || shingle)) AS m1,
      |  min(md5('2|' || shingle)) AS m2, min(md5('3|' || shingle)) AS m3,
      |  min(md5('4|' || shingle)) AS m4, min(md5('5|' || shingle)) AS m5
      | FROM sh GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, unnest(['0:' || m0 || m1, '1:' || m2 || m3,
      |                         '2:' || m4 || m5]) AS band FROM sig)
      |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |FROM banded a JOIN banded b
      |  ON a.band = b.band AND a.doc_id < b.doc_id
      |ORDER BY id1, id2""".stripMargin

  /** 16-bit SimHash over tokens (frequency-weighted): bit j is the sign
    * of Σ±1 where the contribution is +1 when hex digit j of md5(token)
    * has its high nibble-bit set ('8'..'f' sort after '8'). Avoids any
    * hex→int parsing so both engines agree bit-for-bit.
    */
  def q43Simhash(s: SparkSession, dir: String): DataFrame = {
    val tok = documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("h", md5(col("w")))
    val bitSums = (0 until 16).map(j =>
      sum(when(substring(col("h"), j + 1, 1) >= "8", 1).otherwise(-1))
        .as(s"b$j"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val bits = (0 until 16).map(j =>
      when(col(s"b$j") >= 0, lit("1")).otherwise(lit("0")))
    agg.select(col("doc_id"), concat(bits: _*).as("simhash"))
      .orderBy("doc_id")
  }

  val q43Oracle: String = {
    val sums = (0 until 16).map(j =>
      s"sum(CASE WHEN substr(md5(w), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n  ")
    val bits = (0 until 16).map(j =>
      s"CASE WHEN b$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH t AS (SELECT doc_id, unnest($tokensSql) AS w FROM documents),
      |s AS (SELECT doc_id,
      |  $sums
      | FROM t GROUP BY doc_id)
      |SELECT doc_id, $bits AS simhash
      |FROM s
      |ORDER BY doc_id""".stripMargin
  }

  /** Near-duplicate CLUSTER assignment: connected components over the
    * MinHash-LSH candidate graph (q42's pairs), labeling every document
    * with the minimum doc_id reachable through near-dup edges — the
    * step that turns pair lists into keep/drop decisions (the cluster
    * id IS the canonical keeper).
    *
    * Algorithm: distributed min-label propagation with the current
    * label relation folded back into the edge set each round. Folding
    * labels in gives pointer-doubling behavior (a node can adopt its
    * neighbor's CLUSTER, not just its neighbor), so rounds needed grow
    * with log(component diameter) rather than diameter — the same
    * regime as the alternating large-star/small-star algorithm
    * (Kiveris et al., "Connected components in MapReduce and beyond",
    * SoCC 2014). Each round is one shuffle keyed on node id; labels are
    * localCheckpoint'd per round so the plan stays O(1) deep instead of
    * O(rounds) (lineage growth is what kills iterative DataFrame jobs
    * at scale), and convergence is detected by the strictly-decreasing
    * label sum — one scalar aggregate per round, no extra join.
    */
  /** SimHash near-duplicates: pairs of documents whose 16-bit
    * fingerprints differ in ≤ 2 bits, found through band-bucketed
    * candidates — the pigeonhole guarantee that makes SimHash usable at
    * scale: split 16 bits into 3 bands (6+6+4); 2 differing bits can
    * touch at most 2 bands, so every qualifying pair shares at least
    * one intact band and meets on a (band_index, band_value) join key.
    * No all-pairs comparison anywhere; the exact Hamming check runs
    * only on band-collision candidates, as `bit_count(a XOR b)` over
    * the fingerprints parsed base-2 — all native codegen'd expressions.
    */
  def q67SimhashNearDup(s: SparkSession, dir: String): DataFrame =
    // 32-bit signature (vs q43's 16-bit gate query): at 16 bits a
    // templated corpus collides so heavily that hamming ≤ 2 matches
    // ~30% of all pairs — no discrimination and a quadratic pair
    // list. Doubling the signature makes the same threshold select
    // real near-dups (~1% of pairs on this corpus) and shrinks the
    // band buckets 32×, which is where the join cost lives.
    simhashNearDupPairs(documents(s, dir), widthBits = 32)
      .orderBy("id1", "id2")

  /** Band-collision candidate pairs for a `widthBits` SimHash: 3 bands
    * of ⌈w/3⌉-ish bits each, so ≤2 differing bits leave ≥1 band intact
    * (pigeonhole) and every qualifying pair meets on a (band_index,
    * band_value) equi-join key — no all-pairs comparison anywhere.
    *
    * WIDTH IS THE SCALE KNOB, measured empirically (SCALE.md, sf0.1→
    * sf1 run): with fixed band width b, expected candidate volume is
    * Σ_buckets C(occ,2) ≈ n²/2^(b+1) — quadratic in the corpus once
    * bucket occupancy n/2^b passes O(1). Keeping occupancy constant
    * needs widthBits ≥ 3·(log₂ n − c): 32 bits (2^11 buckets/band)
    * carries ~10⁵ docs; 10⁸ docs want ~64 bits (2^21 buckets/band).
    * Width is semantic (it defines which pairs are "near"), so it is
    * a caller parameter with the sizing rule documented, not an
    * auto-adapted default that would make results corpus-dependent.
    */
  private[ops] def simhashBandCandidates(docs: DataFrame,
      widthBits: Int): DataFrame = {
    require(widthBits >= 3 && widthBits <= 64,
      s"widthBits $widthBits outside [3, 64]")
    // md5 yields 32 hex chars = 32 bit-votes; wider signatures draw
    // from sha2-256's 64. One hash per token feeds every bit.
    val hashHex = if (widthBits <= 32) md5(col("w")) else sha2(col("w"), 256)
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("h", hashHex)
    val bitSums = (0 until widthBits).map(j =>
      sum(when(substring(col("h"), j + 1, 1) >= "8", 1).otherwise(-1))
        .as(s"b$j"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val bits = (0 until widthBits).map(j =>
      when(col(s"b$j") >= 0, lit("1")).otherwise(lit("0")))
    // pack the long directly from the sign columns — string conv would
    // produce an UNSIGNED decimal that ANSI cast rejects once the top
    // bit is set (width 64); shiftleft(1L, 63) wraps to the sign bit's
    // two's-complement pattern, which is all XOR/bit_count ever see
    val packed = (0 until widthBits).map(j =>
      when(col(s"b$j") >= 0,
        shiftleft(lit(1L), widthBits - 1 - j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val fp = agg.select(col("doc_id"), concat(bits: _*).as("simhash"),
      packed.as("h"))
    val w1 = (widthBits + 2) / 3
    val w2 = (widthBits - w1 + 1) / 2
    val w3 = widthBits - w1 - w2
    val banded = fp.select(col("doc_id"), col("h"),
      explode(array(
        concat(lit("0:"), substring(col("simhash"), 1, w1)),
        concat(lit("1:"), substring(col("simhash"), w1 + 1, w2)),
        concat(lit("2:"), substring(col("simhash"), w1 + w2 + 1, w3))))
        .as("band"))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long")
          .as("hamming"))
  }

  /** Exact hamming ≤ 2 near-dup pairs over band-collision candidates. */
  def simhashNearDupPairs(docs: DataFrame, widthBits: Int): DataFrame =
    simhashBandCandidates(docs, widthBits)
      // filter BEFORE distinct: hamming is a pure function of the
      // pair, so the order commutes, and the ≤2 cut drops ~99% of the
      // candidate volume before the dedup shuffle has to carry it
      .filter(col("hamming") <= 2)
      .distinct()

  /** Oracle computes Hamming positionally (DuckDB lacks base-2 conv):
    * count of positions where the fingerprint strings differ.
    */
  val q67Oracle: String = {
    val sums = (0 until 32).map(j =>
      s"sum(CASE WHEN substr(md5(w), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n  ")
    val bits = (0 until 32).map(j =>
      s"CASE WHEN b$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH t AS (SELECT doc_id, unnest($tokensSql) AS w FROM documents),
      |s AS (SELECT doc_id,
      |  $sums
      | FROM t GROUP BY doc_id),
      |fp AS (SELECT doc_id, $bits AS simhash FROM s),
      |banded AS (SELECT doc_id, simhash,
      |  unnest(['0:' || substr(simhash, 1, 11), '1:' || substr(simhash, 12, 11),
      |          '2:' || substr(simhash, 23, 10)]) AS band FROM fp),
      |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
      |    a.simhash AS h1, b.simhash AS h2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.doc_id < b.doc_id)
      |SELECT id1, id2,
      | CAST(length(list_filter([i for i in generate_series(1, 32)],
      |   i -> substr(h1, i, 1) <> substr(h2, i, 1))) AS BIGINT) AS hamming
      |FROM cand
      |WHERE length(list_filter([i for i in generate_series(1, 32)],
      |   i -> substr(h1, i, 1) <> substr(h2, i, 1))) <= 2
      |ORDER BY id1, id2""".stripMargin
  }

  /** INCREMENTAL near-dup detection through the CDC path — the
    * composition a production ingest runs nightly: documents live in a
    * versioned lake table; a new batch arrives as a commit; the change
    * feed yields ONLY the new documents; their LSH bands join against
    * the full corpus's bands. Cost per run is O(new × collision rate),
    * not O(corpus²) — the whole point of pairing the lake's CDC with
    * banded dedup. Emitted pairs are exactly the full-corpus pairs that
    * involve at least one new document (the oracle states that set
    * directly; the gate proves incremental == full-recompute-restricted).
    *
    * At scale the corpus-side bands would be a persisted signature
    * table maintained by the same CDC loop instead of recomputed — the
    * band join itself is unchanged.
    */
  def q74IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir("graft_incr_dedup").toString + "/documents"
    val docs = documents(s, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val lake = graft.lake.MiniLake(s, base)
    lake.create(docs.filter(col("doc_id") < 400))
    lake.append(docs.filter(col("doc_id") >= 400))

    // CDC: only the appended batch flows into signature computation
    val newDocs = lake.readChanges(1, 1)
      .filter(col(graft.lake.MiniLake.ChangeType) === "insert")
      .select("doc_id", "text")
    val corpus = lake.snapshot().select("doc_id", "text")

    val newBands = bandedSignatures(newDocs)
    val allBands = bandedSignatures(corpus)
    newBands.as("a")
      .join(allBands.as("b"), col("a.band") === col("b.band") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id2"))
      .distinct()
      .orderBy("id1", "id2")
  }

  /** Full-corpus banding restricted to pairs touching the new batch. */
  val q74Oracle: String =
    s"""WITH $shinglesSql,
      |sig AS (SELECT doc_id,
      |  min(md5('0|' || shingle)) AS m0, min(md5('1|' || shingle)) AS m1,
      |  min(md5('2|' || shingle)) AS m2, min(md5('3|' || shingle)) AS m3,
      |  min(md5('4|' || shingle)) AS m4, min(md5('5|' || shingle)) AS m5
      | FROM sh GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, unnest(['0:' || m0 || m1, '1:' || m2 || m3,
      |                         '2:' || m4 || m5]) AS band FROM sig)
      |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |FROM banded a JOIN banded b
      |  ON a.band = b.band AND a.doc_id < b.doc_id
      |WHERE a.doc_id >= 400 OR b.doc_id >= 400
      |ORDER BY id1, id2""".stripMargin

  /** Distributed connected components: label every node in `nodes`
    * (column `doc_id`) with the minimum node id reachable through
    * `pairs` (columns `id1`, `id2`, undirected). See [[q57DedupClusters]]
    * for the algorithmic notes.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val s = nodes.sparkSession
    // Size-based arm switch (the q198/GraphLocal device, VERDICT r12
    // #2): below the cap the whole min-label fixpoint runs as a
    // single-task union-find — one job instead of rounds × (join +
    // agg + checkpoint) whose scheduling dominates on a label frame
    // orders of magnitude below the corpus. The converged answer is
    // identical BY CONSTRUCTION: the distributed loop's fixpoint
    // labels every node with the minimum id reachable through pairs
    // RESTRICTED to the node set (an endpoint without a label row
    // never relays), and union-by-min-root computes exactly that
    // restriction's component minima. DedupSpec pins arm equality;
    // `graft.cc.localMaxRows=0` forces the distributed loop.
    val localCap = s.conf.getOption("graft.cc.localMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    if (localCap > 0) {
      val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = p.count()
      val n = if (m <= localCap) nodes.count() else Long.MaxValue
      if (m <= localCap && n <= localCap - m) {
        import s.implicits._
        // one tagged feed so node set and edges arrive in one task
        val tagged = nodes.select(col("doc_id").cast("long").as("a"),
            lit(Long.MinValue).as("b"))
          .unionByName(p.select(col("id1").cast("long").as("a"),
            col("id2").cast("long").as("b")))
        val out = tagged.as[(Long, Long)].coalesce(1)
          .mapPartitions { it =>
            val nodeSet = new java.util.HashSet[java.lang.Long]()
            val edges = new scala.collection.mutable.ArrayBuffer[Long]()
            it.foreach { case (a, b) =>
              if (b == Long.MinValue) nodeSet.add(a)
              else { edges += a; edges += b }
            }
            val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
            def find(x0: Long): Long = {
              var x = x0
              var px = parent.get(x)
              while (px != null && px.longValue() != x) {
                val gp = parent.get(px.longValue())
                if (gp != null) parent.put(x, gp) // path halving
                x = px.longValue()
                px = parent.get(x)
              }
              x
            }
            var i = 0
            while (i < edges.length) {
              val a = edges(i); val b = edges(i + 1)
              if (nodeSet.contains(a) && nodeSet.contains(b)) {
                val ra = find(a); val rb = find(b)
                if (ra != rb) {
                  if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
                }
              }
              i += 2
            }
            val outRows = new Array[(Long, Long)](nodeSet.size())
            val nit = nodeSet.iterator()
            var j = 0
            while (nit.hasNext) {
              val d = nit.next().longValue()
              outRows(j) = (d, find(d)); j += 1
            }
            outRows.iterator
          }
          .toDF("doc_id", "cluster_id")
          .localCheckpoint()
        p.unpersist(false)
        return out
      }
      p.unpersist(false)
    }
    // The label frame is pair-graph-sized (near-dup candidates), orders
    // of magnitude below the corpus; every round's join+agg re-shuffles
    // it, so partition the LOOP for the label cardinality the way the
    // streaming queries size their state stores — at cluster scale this
    // is `min(defaultParallelism, |labels| / rowsPerTask)`, here the
    // local equivalent. Restored after the loop.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(prevShuffle.toInt, 4).toString)
    try connectedComponentsLoop(nodes, pairs)
    finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** Materialize a loop-carried frame AND reset its statistics.
    * `Dataset.localCheckpoint` truncates lineage but COPIES the child
    * plan's size estimate into the resulting LogicalRDD — so a
    * join+union loop compounds the estimate ~2× per round and the
    * BigInt `sizeInBytes` doubles until Catalyst's planning arithmetic
    * is the bottleneck, not the data (measured at sf1: round 22 of
    * the τ-graph took 89 s to PLAN on a million-digit estimate while
    * its tasks ran in 0.05 s; the full semdedup wall was 375 s, ~150 s
    * of it this). Checkpointing the underlying RDD and rebuilding the
    * frame gives the same truncation with fresh default stats — every
    * round plans in constant time at any round count.
    */
  private[graft] def checkpointReset(df: DataFrame): (DataFrame, Long) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    // ONE action per round: the foreach both materializes the
    // checkpoint (later rounds build on blocks, not lineage) and folds
    // the convergence statistic, replacing a separate sum job.
    // Accumulator updates inside an ACTION are applied exactly once
    // per task, so retries can't skew the sum.
    val acc = df.sparkSession.sparkContext.longAccumulator
    rdd.foreach(r => acc.add(r.getLong(1)))
    (df.sparkSession.createDataFrame(rdd, df.schema), acc.value)
  }

  private def connectedComponentsLoop(nodes: DataFrame,
      pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))

    var (labels, sum) = checkpointReset(
      nodes.select(col("doc_id"), col("doc_id").as("cluster_id")))
    var prevSum = Long.MaxValue
    var rounds = 0
    while (sum < prevSum && rounds < 50) {
      // labels double as edges: doc -> cluster and cluster -> doc
      val hops = edges
        .unionByName(labels.select(col("doc_id").as("src"),
          col("cluster_id").as("dst")))
        .unionByName(labels.select(col("cluster_id").as("src"),
          col("doc_id").as("dst")))
      val nbrMin = hops.join(labels, col("dst") === col("doc_id"))
        .groupBy(col("src")).agg(min("cluster_id").as("nbr_min"))
      // (an explicit label(label(x)) path-halving join was tried here
      // and REVERTED: the fold-in of label edges above already gives
      // pointer-doubling behavior, and the extra self-join per round
      // cost more than the rounds it saved at every measured scale —
      // q180 sf1 10.6 -> 12.4 s with it)
      val next = checkpointReset(
        labels.join(nbrMin, col("doc_id") === col("src"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id")))
      labels = next._1
      prevSum = sum
      sum = next._2
      rounds += 1
    }
    labels
  }

  def q57DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir).select(col("doc_id"))
    val pairs = q42MinhashLsh(s, dir).select(col("id1"), col("id2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = connectedComponents(docs, pairs)
    pairs.unpersist()
    labels.orderBy("doc_id")
  }

  /** Shared oracle CTE chain: MinHash-banded candidate pairs →
    * undirected edges → transitive closure (`reach`), ending with the
    * per-root min reachable node. Used by q57 (raw labels) and q141
    * (per-cluster survivorship on top of the labels).
    */
  private val ccCtes: String =
    s"""$shinglesSql,
      |sig AS (SELECT doc_id,
      |  min(md5('0|' || shingle)) AS m0, min(md5('1|' || shingle)) AS m1,
      |  min(md5('2|' || shingle)) AS m2, min(md5('3|' || shingle)) AS m3,
      |  min(md5('4|' || shingle)) AS m4, min(md5('5|' || shingle)) AS m5
      | FROM sh GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, unnest(['0:' || m0 || m1, '1:' || m2 || m3,
      |                         '2:' || m4 || m5]) AS band FROM sig),
      |p AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |      FROM banded a JOIN banded b
      |        ON a.band = b.band AND a.doc_id < b.doc_id),
      |e AS (SELECT id1 AS src, id2 AS dst FROM p
      |      UNION ALL SELECT id2, id1 FROM p),
      |reach(root, node) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.root, e.dst FROM reach r JOIN e ON r.node = e.src)""".stripMargin

  /** Transitive closure over the same pair graph; min reachable node =
    * cluster id. Small-graph formulation (the gate corpus has tens of
    * near-dup pairs) — the Spark side is the at-scale formulation.
    */
  val q57Oracle: String =
    s"""WITH RECURSIVE $ccCtes
      |SELECT root AS doc_id, min(node) AS cluster_id
      |FROM reach GROUP BY root
      |ORDER BY doc_id""".stripMargin

  /** Cluster survivorship ([EXT]): after near-dup clustering (q57's
    * connected components over the MinHash-LSH pair graph), pick the
    * canonical document per multi-member cluster — the doc with the
    * most characters, ties to the lowest doc_id — and report cluster
    * sizes. This is the "keep one representative" step every dedup
    * pipeline runs between candidate clustering and corpus rewrite
    * (cf. the reference's dedup-then-select flow; the richest-document
    * rule is the common default when no quality model is available).
    *
    * Scale shape: the windows partition by `cluster_id`, whose groups
    * are near-dup clusters — bounded by duplication depth (tens), never
    * corpus-sized — so no single-partition window exists; the join back
    * to `documents` for `n_chars` is label-frame-sized against a scan.
    */
  def q141ClusterCanonical(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir).select(col("doc_id"), col("n_chars"))
    val pairs = q42MinhashLsh(s, dir).select(col("id1"), col("id2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = connectedComponents(docs.select("doc_id"), pairs)
    pairs.unpersist()
    val w = Window.partitionBy("cluster_id")
    val byRichness = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
    labels.join(docs, "doc_id")
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(byRichness))
      .filter(col("rn") === 1 && col("n_members") > 1)
      .select(col("cluster_id"), col("doc_id").as("canonical_doc"),
        col("n_chars").as("canonical_chars"), col("n_members"))
      .orderBy("cluster_id")
  }

  val q141Oracle: String =
    s"""WITH RECURSIVE $ccCtes,
      |labels AS (SELECT root AS doc_id, min(node) AS cluster_id
      |           FROM reach GROUP BY root),
      |sized AS (SELECT l.doc_id, l.cluster_id, d.n_chars,
      |  count(*) OVER (PARTITION BY l.cluster_id) AS n_members,
      |  row_number() OVER (PARTITION BY l.cluster_id
      |      ORDER BY d.n_chars DESC, l.doc_id) AS rn
      | FROM labels l JOIN documents d ON l.doc_id = d.doc_id)
      |SELECT cluster_id, doc_id AS canonical_doc,
      |  n_chars AS canonical_chars, n_members
      |FROM sized WHERE rn = 1 AND n_members > 1
      |ORDER BY cluster_id""".stripMargin

  /** Benchmark decontamination ([EXT]): flag training documents that
    * share any word n-gram with a held-out evaluation set — the
    * standard pre-training hygiene step (GPT-3 used 13-gram overlap,
    * Brown et al. 2020 appendix C; PaLM and Llama use 8–13). This
    * corpus's documents are short, so n=5 keeps the probe sensitive
    * while still being far too long to collide by chance.
    *
    * Scale design: the eval side is a benchmark suite — megabytes
    * against a 100 TB corpus — so its distinct shingle hashes
    * broadcast and the corpus side stays a single narrow scan
    * (per-doc window for n-grams, then a broadcast semi-ish inner
    * join + per-doc count). No shuffle is keyed on anything wider
    * than (doc_id). Joining on xxhash64 of the shingle keeps the
    * broadcast at 8 bytes/shingle; collision odds over a benchmark
    * suite are ~2^-64·|eval|·|corpus| — noise.
    */
  val DecontamN = 5

  /** Word n-gram shingles per document, one row per position
    * (documents shorter than n contribute one whole-document
    * shingle) — via the codegen'd
    * [[graft.functions.ShingleExpressions.WordNGrams]] kernel:
    * shingling is row-local, so the shuffle+sort the old
    * posexplode+window-`lead` compose paid (the full token stream
    * exchanged on doc_id) is gone; the shingles materialize inside
    * the scan task and `explode` restores the long shape.
    */
  private[ops] def ngramsRaw(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"),
      explode(graft.functions.ShingleExpressions.word_ngrams(
        col("text"), n)).as("shingle"))

  def q94Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = ngramsRaw(documents(s, dir), DecontamN)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    val evalSet = sh.filter(col("doc_id") % 97 === 0)
      .select("shingle").distinct()
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalSet), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  val q94Oracle: String = {
    val n = DecontamN
    s"""WITH w AS (SELECT doc_id, $tokensSql AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(CASE WHEN length(ws) >= $n
      |    THEN [array_to_string(ws[i:i+${n - 1}], ' ')
      |          for i in generate_series(1, length(ws)-${n - 1})]
      |    ELSE [array_to_string(ws, ' ')] END) AS shingle
      | FROM w),
      |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
      |SELECT s.doc_id, count(*) AS n_shared
      |FROM sh s JOIN ev USING (shingle)
      |WHERE s.doc_id % 97 <> 0
      |GROUP BY s.doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** Train/test split with a LEAKAGE GUARD — the step a naive random
    * split misses: a training document that shares verbatim content
    * with a held-out document leaks the test set into training. Test =
    * a deterministic ~10% of doc_ids; any non-test document sharing an
    * 8-gram shingle with ANY test document is quarantined out of
    * train. The same inverted-index shape as [[q94Decontaminate]]:
    * shingles hash to 8-byte keys before the exchange, the test-set
    * shingle list broadcasts (the held-out set is the small side by
    * construction), and the quarantine decision is one semi-join
    * probe per (doc, shingle) — never a doc×doc comparison.
    */
  def q119LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    val sh = ngramsRaw(documents(s, dir), DecontamN)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    val evalSh = sh.filter(col("doc_id") % 10 === 7)
      .select("shingle").distinct()
    val leaked = sh.filter(col("doc_id") % 10 =!= 7)
      .join(broadcast(evalSh), Seq("shingle"))
      .select("doc_id").distinct()
      .withColumn("leak", lit(1))
    documents(s, dir).select("doc_id")
      .join(leaked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 7, lit("test"))
          .when(col("leak").isNotNull, lit("quarantine"))
          .otherwise(lit("train")).as("split"))
      .orderBy("doc_id")
  }

  val q119Oracle: String = {
    val n = DecontamN
    s"""WITH w AS (SELECT doc_id, $tokensSql AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(CASE WHEN length(ws) >= $n
      |    THEN [array_to_string(ws[i:i+${n - 1}], ' ')
      |          for i in generate_series(1, length(ws)-${n - 1})]
      |    ELSE [array_to_string(ws, ' ')] END) AS shingle
      | FROM w),
      |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 7),
      |leak AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (shingle)
      |         WHERE s.doc_id % 10 <> 7)
      |SELECT d.doc_id,
      | CASE WHEN d.doc_id % 10 = 7 THEN 'test'
      |      WHEN l.doc_id IS NOT NULL THEN 'quarantine'
      |      ELSE 'train' END AS split
      |FROM documents d LEFT JOIN leak l ON d.doc_id = l.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }

  val SetSimN = 3
  val SetSimTau = 0.5

  /** Set-similarity self-join by PREFIX FILTERING (Bayardo, Ma,
    * Srikant, "Scaling up all pairs similarity search", WWW 2007 —
    * the AllPairs/PPJoin candidate generator): exact Jaccard ≥ τ
    * pairs over 3-gram shingle sets, WITHOUT intersecting all
    * co-occurring pairs.
    *
    * Why it's exact: order every set by global rarity (document
    * frequency asc, hash asc — one consistent total order). If
    * J(x,y) ≥ τ then |x∩y| ≥ τ·max(|x|,|y|); were no common element
    * inside x's first |x|−⌈τ|x|⌉+1 elements, ALL common elements
    * would sit in x's ⌈τ|x|⌉−1-element suffix — fewer than τ|x| ≤
    * |x∩y| of them, a contradiction. The minimal common element
    * therefore lies in BOTH prefixes, so joining prefixes only loses
    * nothing.
    *
    * Why it scales where q41's df-capped index degrades gracefully:
    * the candidate join's posting lists hold only each document's
    * RAREST few shingles — frequency ordering pushes hot shingles
    * into suffixes that never enter the join — and verification runs
    * `array_intersect` on the candidate pairs alone, never the full
    * co-occurrence matrix. Shuffle keys are 8-byte hashes throughout.
    */
  def q130SetSimJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The shingle table feeds FIVE consumers (df counts, both prefix
    // sides, both verification sides); without materialization each
    // consumer re-runs scan+shingle+distinct — the measured plan held
    // six parquet scans. localCheckpoint computes it once and keeps
    // lineage O(1) (the q57 pattern); at 100 TB this is the
    // checkpoint-the-shingle-table step every set-similarity pipeline
    // performs before candidate generation.
    val docSets = ngramsRaw(documents(s, dir), SetSimN)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("g"))).as("gs"),
        count(lit(1)).as("k"))
      .localCheckpoint()
    val sh = docSets.select(col("doc_id"), col("k"),
      explode(col("gs")).as("g"))
    // document frequency as a count-over-window keyed on the shingle:
    // one exchange of the shingle table, where a groupBy + join back
    // costs two more full-table exchanges for the same answer
    val wG = Window.partitionBy("g")
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("g"))
    // NOT checkpointed: the self-join's two prefix subtrees look
    // duplicated in explain, but ReuseExchange shares them at runtime
    // (measured r13: checkpointing ADDED 0.15 s of materialization for
    // zero exchange savings)
    val prefixes = sh
      .withColumn("df", count(lit(1)).over(wG))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <= col("k") - ceil(col("k") * SetSimTau) + 1)
      .select("doc_id", "g")
    val cands = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val jac = col("i") * lit(1.0) / (col("k1") + col("k2") - col("i"))
    cands
      .join(docSets.select(col("doc_id").as("id1"), col("gs").as("g1"),
        col("k").as("k1")), "id1")
      .join(docSets.select(col("doc_id").as("id2"), col("gs").as("g2"),
        col("k").as("k2")), "id2")
      .withColumn("i", size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .filter(jac >= SetSimTau)
      .select(col("id1"), col("id2"),
        round(jac, 4).cast("decimal(18,4)").cast("double").as("jaccard"))
      .orderBy("id1", "id2")
  }

  val q130Oracle: String = {
    val n = SetSimN
    s"""WITH w AS (SELECT doc_id, $tokensSql AS ws FROM documents),
      |s AS (SELECT DISTINCT doc_id,
      |  unnest(CASE WHEN length(ws) >= $n
      |    THEN [array_to_string(ws[i:i+${n - 1}], ' ')
      |          for i in generate_series(1, length(ws)-${n - 1})]
      |    ELSE [array_to_string(ws, ' ')] END) AS g
      | FROM w),
      |sz AS (SELECT doc_id, count(*) AS k FROM s GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      | FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
      | GROUP BY 1, 2)
      |SELECT id1, id2,
      | CAST(CAST(round(i * 1.0 / (x.k + y.k - i), 4) AS DECIMAL(18,4))
      |   AS DOUBLE) AS jaccard
      |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      |WHERE i * 1.0 / (x.k + y.k - i) >= $SetSimTau
      |ORDER BY id1, id2""".stripMargin
  }

  /** Entity resolution by rarest-token blocking ([EXT]): near-duplicate
    * part names found as (block, verify) — the Fellegi-Sunter /
    * Dedupe.io blocking pattern. The pipeline first collapses the
    * table to DISTINCT names with occurrence counts (at 100 TB the
    * entity catalog is orders of magnitude smaller than the fact
    * table — this aggregate is the only full scan); each name then
    * enters exactly ONE block, keyed by its globally rarest token
    * (document frequency asc, token asc — a total order encoded as a
    * sortable string so a plain min() picks it). Rarest-token keying
    * bounds block sizes the way q130's prefix filter bounds posting
    * lists: hot tokens never become block keys. Pairs are verified
    * with exact Levenshtein INSIDE blocks only — never all pairs.
    */
  def q147ErBlocking(s: SparkSession, dir: String): DataFrame = {
    val names = part(s, dir).groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val tok = names.select(col("name"), col("n_parts"),
      explode(split(col("name"), " ")).as("t"))
    val wT = Window.partitionBy("t")
    val blk = tok
      .withColumn("df", count(lit(1)).over(wT))
      .withColumn("key", concat(lpad(col("df").cast("string"), 10, "0"),
        lit("|"), col("t")))
      .groupBy("name").agg(min(col("key")).as("bkey"),
        max(col("n_parts")).as("n_parts"))
    blk.as("a").join(blk.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.name") < col("b.name"))
      .withColumn("dist",
        levenshtein(col("a.name"), col("b.name")).cast("long"))
      .filter(col("dist") <= 4)
      .select(col("a.name").as("name1"), col("b.name").as("name2"),
        col("dist"), col("a.n_parts").as("parts1"),
        col("b.n_parts").as("parts2"))
      .orderBy("name1", "name2")
  }

  val q147Oracle: String =
    """WITH names AS (SELECT p_name AS name, count(*) AS n_parts
      |  FROM part GROUP BY p_name),
      |tok AS (SELECT name, n_parts,
      |  unnest(string_split(name, ' ')) AS t FROM names),
      |df AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
      |blk AS (SELECT name,
      |  min(concat(lpad(CAST(df.df AS VARCHAR), 10, '0'), '|', tok.t))
      |    AS bkey,
      |  max(n_parts) AS n_parts
      | FROM tok JOIN df USING (t) GROUP BY name)
      |SELECT a.name AS name1, b.name AS name2,
      | CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
      | a.n_parts AS parts1, b.n_parts AS parts2
      |FROM blk a JOIN blk b ON a.bkey = b.bkey AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 4
      |ORDER BY name1, name2""".stripMargin

  /** Incremental near-dup via LSH against an existing index — the
    * day-2 shape of q42: when a new batch lands (simulated here as the
    * doc_id % 10 == 0 slice, standing in for a CDF insert batch), its
    * banded signatures probe ONLY the standing corpus's band buckets.
    * Work is O(batch × bucket density), never corpus × corpus: the
    * standing side's banded index is exactly what a production
    * pipeline keeps materialized in the lake and maintains from the
    * change feed (q74's watermark machinery), so daily dedup of a
    * 100 TB corpus costs one batch-sized shuffle join, not a rescan.
    * Join skew is bounded by the hot-band cap argument of q41 (bands
    * are 2-minhash composites — collisions require genuine
    * similarity).
    */
  def q153IncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val isNew = col("doc_id") % 10 === 0
    val newBanded = bandedSignatures(docs.filter(isNew))
    val oldBanded = bandedSignatures(docs.filter(!isNew))
    newBanded.as("a")
      .join(oldBanded.as("b"), "band")
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("dup_of"))
      .distinct()
      .orderBy("new_id", "dup_of")
  }

  val q153Oracle: String =
    s"""WITH $shinglesSql,
      |sig AS (SELECT doc_id,
      |  min(md5('0|' || shingle)) AS m0, min(md5('1|' || shingle)) AS m1,
      |  min(md5('2|' || shingle)) AS m2, min(md5('3|' || shingle)) AS m3,
      |  min(md5('4|' || shingle)) AS m4, min(md5('5|' || shingle)) AS m5
      | FROM sh GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, unnest(['0:' || m0 || m1, '1:' || m2 || m3,
      |                         '2:' || m4 || m5]) AS band FROM sig)
      |SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS dup_of
      |FROM banded a JOIN banded b ON a.band = b.band
      |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      |ORDER BY new_id, dup_of""".stripMargin

  // ---- SemDeDup: cluster-then-prune semantic dedup ---------------------

  /** SemDeDup ([EXT]; Abbas et al., "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", arXiv:2303.09540):
    * embedding-space dedup that never computes a corpus×corpus matrix —
    * vectors are first CLUSTERED, pairwise cosine runs only WITHIN a
    * cluster, and each duplicate group keeps the member FARTHEST from
    * its cluster centroid (the paper's low-centroid-similarity rule:
    * retain the least-prototypical example, maximizing diversity).
    * Distinct from [[graft.ops.Similarity.q44EmbeddingNearDup]] (exact
    * global pair list) and [[q141ClusterCanonical]] (lexical clusters,
    * richest-doc keeper): this is the end-to-end corpus keep/prune
    * DECISION on embedding geometry.
    *
    * The quantizer here is sign-random-projection (Charikar, STOC 2002)
    * over [[SemDedupBits]] fixed ±1 hyperplanes — deterministic and
    * exactly SQL-expressible, which is what lets the WHOLE pipeline
    * (cells → centroids → dup graph → components → survivors) gate
    * hash-exact against the oracle instead of by ε-witness; the
    * paper's k-means quantizer is implemented too ([[semCellsKmeans]],
    * q55's sample-fit machinery feeding the same [[semDedupFrom]]
    * decision — cells are opaque ids downstream) and gates by
    * SemDedupSpec's invariant witness, since Lloyd's isn't SQL-exact.
    *
    * Scale design (the paper's own web-scale story): cluster count is
    * the knob — 2^bits grows with the corpus so per-cell population
    * stays ~constant and total in-cell pairwise work stays linear; the
    * only corpus-sized shuffle is keyed on cell, centroids are a
    * 2^bits-row broadcast, and the component loop runs on the dup
    * graph (duplicate-density-sized, not corpus-sized). Numeric
    * determinism: per-dimension centroid sums quantize to
    * DECIMAL(28,9) BEFORE summing (addition order independent in both
    * engines — the SCALE.md decimal rule); every cosine rounds to
    * 6 dp; ties break on vec_id.
    */
  val SemDedupBits = 3
  val SemDedupTau = 0.42
  /** Target vectors per pairwise block — per-task candidate work is
    * ≤ SemDedupBlockSize², whatever the corpus or skew does. */
  private[graft] val SemDedupBlockSize = 512
  /** Hyperplane budget for the adaptive gate (q184): 2^12 cells cover
    * ~2.5 M vectors at the target occupancy; beyond that the k-means
    * quantizer path ([[semCellsKmeans]]) is the production choice. */
  private[graft] val SemDedupMaxBits = 12
  /** Target per-cell population the sizing rule holds ~constant —
    * calibrated so the gate SFs land exactly at SemDedupBits (q184
    * reproduces q180 bit-for-bit at sf≤0.1, then grows). */
  private[graft] val SemDedupCellTarget = 625L
  private val SemDedupDims = 64

  /** The sizing rule, integer-exact (mirrored in [[q184Oracle]]'s CASE
    * chain): smallest bits with cellTarget·2^bits ≥ n, floored at the
    * fixed gate's granularity and capped by the hyperplane budget.
    * Growing bits with log₂ n keeps per-cell population ~constant, so
    * total in-cell pairwise work stays LINEAR in the corpus — this is
    * the measured difference between q184 and fixed-bits q180 in
    * SCALE.md's sf1 table.
    */
  private[graft] def semBitsFor(n: Long): Int = {
    var b = SemDedupBits
    while (b < SemDedupMaxBits && (SemDedupCellTarget << b) < n) b += 1
    b
  }

  /** ±1 hyperplane weights, shared verbatim with the SQL oracle. */
  private def semWeights(bits: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until bits).map(j =>
      (0 until SemDedupDims).map(i => Similarity.planeSign(j, i)))

  /** Corpus with its quantizer cell per vector, plan cut once (the
    * frame feeds centroid sums, both pair sides, and scoring). `bits`
    * is THE scale knob: 2^bits cells, per-cell population n/2^bits,
    * in-cell candidate volume Σ C(|cell|,2) ≈ n²/2^(bits+1) — grow
    * bits with log₂ n and total pairwise work stays linear, which is
    * the measured counterpart of q67's simhash band width rule.
    */
  private[graft] def semCells(s: SparkSession, dir: String,
      bits: Int): DataFrame = {
    import graft.functions.VectorExpressions.dot_product
    val w = semWeights(bits)
    val vecs = embeddings(s, dir)
      // null embeddings have no geometry — excluded, as in q44/q45
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def proj(j: Int): Column = round(dot_product(col("v"),
      array(w(j).map(lit): _*)), 6)
    vecs.withColumn("cell",
      (0 until bits).map(j =>
        when(proj(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _))
      .localCheckpoint()
  }

  /** K-means variant of the quantizer — the paper's own choice
    * (arXiv:2303.09540 §3 clusters with k-means; the fixed-hyperplane
    * gate exists because it is SQL-exact). Cells are Lloyd-fit on a
    * bounded hash-ordered sample — exactly the q55 IVF sample-fit
    * protocol ([[Similarity.lloydFit]], ≤256·k collected rows, the
    * metadata-sized-driver-state class) — and every vector assigns to
    * its nearest centroid (the documented UDF exception: per-row
    * argmin over a driver-fit matrix). The fit is iterative floating
    * point, so this path gates by spec-level witness (SemDedupSpec's
    * invariant battery over [[semDedupFrom]]) rather than the DuckDB
    * hash; everything downstream of the cell column is byte-identical
    * to the q180 path.
    */
  private[graft] def semCellsKmeans(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val vecs = embeddings(s, dir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sample = Similarity.hashSample(vecs, 256 * k)
    if (sample.isEmpty)
      return vecs.withColumn("cell", lit(0L)).localCheckpoint()
    val bc = s.sparkContext.broadcast(Similarity.lloydFit(sample, k, 10))
    val assign = udf((v: Seq[java.lang.Double]) => {
      val a = Similarity.unbox(v); val cs = bc.value
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < cs.length) {
        val d = Similarity.dist2(a, cs(c))
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best.toLong
    })
    vecs.withColumn("cell", assign(col("v"))).localCheckpoint()
  }

  /** Ceiling on the block-pair grid: at 1024 blocks the broadcast grid
    * is ~524k rows and each vector replicates ≤1024-fold — past that
    * the grid itself becomes the scale problem. A corpus whose hottest
    * cell exceeds blockSize·cap vectors is under-quantized, and the
    * remedy is GRANULARITY (more bits / k-means cells — what q184's
    * sizing rule automates), not a wider grid; the capped grid
    * degrades to larger-but-bounded tasks instead of an OOM.
    */
  private[graft] val SemDedupMaxBlocks = 1024

  /** Block count for the in-cell pairwise grid, sized from the MAX
    * per-cell population (one 2^bits-row groupBy-count over the
    * checkpointed cells frame — metadata-cheap), not the average: with
    * average-based sizing a skewed hot cell still received
    * ~avg-per-block vectors per block and its tasks grew quadratically
    * with the skew factor. Up to [[SemDedupMaxBlocks]], every task is
    * bounded at ~SemDedupBlockSize² candidate pairs however the corpus
    * distributes; cold cells contribute near-empty grid tasks
    * (scheduling, not compute).
    */
  private[graft] def semBlocks(cells: DataFrame): Int = {
    val maxCell = cells.groupBy("cell").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    math.min(SemDedupMaxBlocks.toLong,
      math.max(1L, (maxCell + SemDedupBlockSize - 1) / SemDedupBlockSize))
      .toInt
  }

  /** The τ-thresholded in-cell candidate pair list (unpersisted plan):
    * each cell splits into `blocks` hash-blocks of its vectors, the
    * broadcast (p1 ≤ p2) grid enumerates block pairs, and a cross-block
    * pair meets in exactly one grid cell because the block id is a
    * function of vec_id; diagonal cells order by id. Shared by
    * [[semDedupDecide]] and the dev profiler so the two can't drift.
    */
  private[graft] def semPairList(s: SparkSession, cells: DataFrame,
      blocks: Int): DataFrame = {
    import graft.functions.VectorExpressions.cosine_similarity
    val gridRows = for (i <- 0 until blocks; j <- i until blocks)
      yield (i, j)
    val grid = broadcast(s.createDataFrame(gridRows).toDF("p1", "p2"))
    val blocked = cells.withColumn("blk",
      pmod(xxhash64(col("vec_id")), lit(blocks)).cast("int"))
    val aSide = blocked.join(grid, col("blk") === col("p1"))
      .select(col("cell"), col("p1"), col("p2"),
        col("vec_id").as("ida"), col("v").as("va"))
    val bSide = blocked.join(grid, col("blk") === col("p2"))
      .select(col("cell"), col("p1"), col("p2"),
        col("vec_id").as("idb"), col("v").as("vb"))
    aSide.join(bSide, Seq("cell", "p1", "p2"))
      .filter(col("p1") =!= col("p2") || col("ida") < col("idb"))
      .filter(round(cosine_similarity(col("va"), col("vb")), 6)
        >= SemDedupTau)
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"))
  }

  def q180SemDedup(s: SparkSession, dir: String): DataFrame =
    semDedupDecide(s, dir, SemDedupBits)

  /** Adaptive-granularity SemDeDup — the scale knob applied IN-BAND:
    * bits come from the corpus count via [[semBitsFor]], so the same
    * query stays linear-work from thousands to millions of vectors
    * with no operator retune, and because the rule is integer-exact
    * SQL, the whole adaptive pipeline still gates HASH-exact against
    * DuckDB (q184) — the knob itself is under the oracle, not just
    * asserted in prose. At the gate SFs the rule lands on
    * [[SemDedupBits]], making q184 ≡ q180 there; SCALE.md's sf1 row
    * measures where they diverge (fixed bits goes quadratic in
    * candidates, adaptive stays ~linear).
    */
  def q184SemDedupAuto(s: SparkSession, dir: String): DataFrame = {
    val n = embeddings(s, dir).filter(col("embedding").isNotNull).count()
    semDedupFrom(s, semCells(s, dir, semBitsFor(n)))
  }

  /** The keep/prune decision at a given quantizer granularity; q180
    * gates the bits=3 point, SemDedupSpec exercises the knob.
    */
  private[graft] def semDedupDecide(s: SparkSession, dir: String,
      bits: Int): DataFrame =
    semDedupFrom(s, semCells(s, dir, bits))

  /** The decision over an ARBITRARY quantization: `cells` must carry
    * (vec_id, v, cell) — cell ids are opaque downstream, which is what
    * lets the paper's k-means quantizer ([[semCellsKmeans]], q55's
    * sample-fit machinery) slot in for the fixed-hyperplane one with
    * no change to centroids, pairing, components, or the keeper rule.
    */
  private[graft] def semDedupFrom(s: SparkSession,
      cells: DataFrame): DataFrame = {
    import graft.functions.VectorExpressions.dot_product
    // per-cell component sums as exact decimals: 64 map-side-combinable
    // aggregates, no explode — the exchange carries 2^bits × 64 decimals.
    // Components that are non-finite or beyond DECIMAL(28,9)'s integral
    // range contribute NULL (sum skips them): under ANSI they'd be a
    // hard cast error, and semantically a corrupt component carries no
    // centroid evidence. Never binds on the gate corpora (small finite
    // floats); mirrored in the oracle CTE.
    val aggs = (0 until SemDedupDims).map { i =>
      // try_element_at: a truncated vector yields NULL beyond its
      // length (ANSI element_at throws)
      val e = round(try_element_at(col("v"), lit(i + 1)), 9)
      sum(when(!isnan(e) && abs(e) <= lit(1e18), e).otherwise(lit(null))
        .cast("decimal(28,9)")).as(s"s$i")
    }
    val cent = cells.groupBy("cell").agg(aggs.head, aggs.tail: _*)
      .select(col("cell"),
        array((0 until SemDedupDims).map(i =>
          col(s"s$i").cast("double")): _*).as("sv"))
    // cos(v, centroid) computed against the exact decimal SUM vector:
    // Σu is parallel to the mean (centroid = Σu/n, n > 0), so
    // cos(v, Σu) IS cos(v, centroid) and no decimal division is ever
    // needed
    val norm = sqrt(dot_product(col("v"), col("v")))
    val snorm = sqrt(dot_product(col("sv"), col("sv")))
    // nanvl: a vector with NaN/Inf elements has NaN norm, and Spark
    // orders NaN > 0 as TRUE — the when() alone would let NaN through
    // into the centrality ranking (where NaN sorts LAST, silently
    // exempting corrupt vectors from ever being the keeper). 0.0 =
    // "no prototypicality evidence", consistent with cosine_similarity.
    // Spark-side only (unlike the decimal-sum guard above, which the
    // oracle mirrors): the SQL gate runs exclusively on the clean gate
    // corpora where nanvl never fires, and dirty corpora are asserted
    // by AdversarialVectorSpec's driver-side referee, not by DuckDB
    val scored = cells.join(broadcast(cent), "cell")
      .withColumn("cos_centroid",
        nanvl(round(when(norm > 0 && snorm > 0,
          dot_product(col("v"), col("sv")) / (norm * snorm))
          .otherwise(lit(0.0)), 6), lit(0.0)))
      .select(col("vec_id"), col("cell"), col("cos_centroid"))
    // In-cell pairwise, sub-blocked q44-style: the cell key alone has
    // only 2^bits distinct values, so once per-cell population exceeds
    // task size the join would run on ≤2^bits tasks with quadratic
    // per-task work (measured: 73× wall for 10× data at bits=3).
    // Splitting each cell into blocks of ~SemDedupBlockSize vectors
    // and enumerating the block-pair grid caps per-task work; at gate
    // SF the grid is a single (0,0) pair and the plan degenerates to
    // the plain cell join. The pair list persists because the
    // component loop consumes it twice per round — unpersisted, every
    // round re-ran the cosine join (measured: 786 s at sf1; persisted
    // + blocked: the join runs once, in parallel).
    val pairs = semPairList(s, cells, semBlocks(cells))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = connectedComponents(
      cells.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    pairs.unpersist()
    // duplicate groups are duplication-depth-sized — the window never
    // sees an unbounded partition
    val byCentrality = Window.partitionBy("cluster_id")
      .orderBy(col("cos_centroid"), col("vec_id"))
    scored.join(labels, "vec_id")
      .withColumn("kept", row_number().over(byCentrality) === 1)
      .select(col("vec_id"), col("cell"), col("cluster_id"),
        col("cos_centroid"), col("kept"))
      .orderBy("vec_id")
  }

  private def semPlaneList(j: Int): String =
    semWeights(SemDedupMaxBits)(j)
      .map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** The full SemDeDup oracle with a pluggable cell-assignment clause:
    * everything downstream of `cells` (decimal centroid sums, the τ
    * pair graph, the recursive-CTE components, the keeper ranking) is
    * quantizer-independent, so the fixed-bits (q180) and
    * adaptive-bits (q184) gates share it verbatim.
    */
  private def semOracleSql(cellsCte: String): String = {
    val sumCols = (0 until SemDedupDims).map(i =>
      s"sum(CASE WHEN isnan(round(v[${i + 1}], 9))" +
        s" OR abs(round(v[${i + 1}], 9)) > 1e18 THEN NULL" +
        s" ELSE CAST(round(v[${i + 1}], 9) AS DECIMAL(28,9)) END) AS s$i")
      .mkString(", ")
    val svExpr = (0 until SemDedupDims).map(i => s"CAST(s$i AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""WITH RECURSIVE e AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      | FROM embeddings WHERE embedding IS NOT NULL),
      |$cellsCte,
      |sums AS (SELECT cell, $sumCols FROM cells GROUP BY cell),
      |cent AS (SELECT cell, $svExpr AS sv FROM sums),
      |scored AS (SELECT c.vec_id, c.cell,
      |  round(CASE WHEN sqrt(list_inner_product(c.v, c.v)) > 0
      |         AND sqrt(list_inner_product(t.sv, t.sv)) > 0
      |    THEN list_inner_product(c.v, t.sv)
      |         / (sqrt(list_inner_product(c.v, c.v))
      |            * sqrt(list_inner_product(t.sv, t.sv)))
      |    ELSE 0.0 END, 6) AS cos_centroid
      | FROM cells c JOIN cent t ON c.cell = t.cell),
      |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2
      |      FROM cells a JOIN cells b
      |        ON a.cell = b.cell AND a.vec_id < b.vec_id
      |      WHERE round(list_cosine_similarity(a.v, b.v), 6)
      |        >= $SemDedupTau),
      |ed AS (SELECT id1 AS src, id2 AS dst FROM p
      |       UNION ALL SELECT id2, id1 FROM p),
      |reach(root, node) AS (
      |  SELECT vec_id, vec_id FROM cells
      |  UNION
      |  SELECT r.root, ed.dst FROM reach r JOIN ed ON r.node = ed.src),
      |labels AS (SELECT root AS vec_id, min(node) AS cluster_id
      |           FROM reach GROUP BY root),
      |ranked AS (SELECT s.vec_id, s.cell, l.cluster_id, s.cos_centroid,
      |  row_number() OVER (PARTITION BY l.cluster_id
      |      ORDER BY s.cos_centroid, s.vec_id) AS rn
      | FROM scored s JOIN labels l ON s.vec_id = l.vec_id)
      |SELECT vec_id, cell, cluster_id, cos_centroid, (rn = 1) AS kept
      |FROM ranked ORDER BY vec_id""".stripMargin
  }

  val q180Oracle: String = {
    val cellExpr = (0 until SemDedupBits).map(j =>
      s"(CASE WHEN round(list_inner_product(v, ${semPlaneList(j)}), 6) >= 0" +
        s" THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    semOracleSql(
      s"cells AS (SELECT vec_id, v, CAST($cellExpr AS BIGINT) AS cell FROM e)")
  }

  val q184Oracle: String = {
    // smallest bits in [SemDedupBits, SemDedupMaxBits] with
    // cellTarget·2^bits ≥ n — integer comparisons only, so the rule
    // evaluates identically in both engines (a log2/ceil formulation
    // risks an off-by-one at exact powers of two from libm rounding)
    val cases = (SemDedupBits until SemDedupMaxBits).map(b =>
      s"WHEN n <= ${SemDedupCellTarget << b} THEN $b").mkString(" ")
    val cellExpr = (0 until SemDedupMaxBits).map(j =>
      s"(CASE WHEN $j < bits AND" +
        s" round(list_inner_product(v, ${semPlaneList(j)}), 6) >= 0" +
        s" THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    semOracleSql(
      s"""nn AS (SELECT count(*) AS n FROM e),
        |bb AS (SELECT (CASE $cases ELSE $SemDedupMaxBits END) AS bits FROM nn),
        |cells AS (SELECT vec_id, v, CAST($cellExpr AS BIGINT) AS cell
        |          FROM e, bb)""".stripMargin)
  }

  /** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
    * JASA 1969; Winkler's m/u formulation) across two sources —
    * suppliers linked to customers. Each candidate pair gets a
    * comparison vector over three fields (key-suffix congruence,
    * balance band, balance-cents parity); field i contributes
    * log2(m_i/u_i) on agreement, log2((1-m_i)/(1-u_i)) on
    * disagreement; the summed weight classifies against the
    * (λ_lower=0, λ_upper=6) decision bands. The m/u values are fixed
    * constants here (production would EM-estimate them); weights are
    * therefore 6-dp literals on BOTH engine sides — no libm in the
    * score, so the gate is hash-exact.
    *
    * Scale: candidate generation is an equi join on (nation,
    * key-suffix) — TWO-field blocking that includes the highest-weight
    * field. That loses nothing: with these m/u, a key-suffix
    * disagreement (-4.307429) outweighs both other agreements
    * (+2.959358 +0.847997 = +3.807), so every pair scoring above
    * λ_lower agrees on the suffix and survives the tighter blocking;
    * pairs the block never generates are exactly the auto-rejects.
    * Per-block pair counts are corpus/(25·100) — skew-free keys.
    */
  def q191FellegiSunter(s: SparkSession, dir: String): DataFrame = {
    val sup = graft.Tables.supplier(s, dir).select(
      col("s_suppkey"), col("s_nationkey").as("nation"),
      pmod(col("s_suppkey"), lit(100L)).as("kmod"),
      floor(col("s_acctbal") / 1000).cast("long").as("band_s"),
      pmod(abs(round(col("s_acctbal") * 100, 0)).cast("long"), lit(2L))
        .as("par_s"))
    val cust = graft.Tables.customer(s, dir).select(
      col("c_custkey"), col("c_nationkey").as("nation"),
      pmod(col("c_custkey"), lit(100L)).as("kmod"),
      floor(col("c_acctbal") / 1000).cast("long").as("band_c"),
      pmod(abs(round(col("c_acctbal") * 100, 0)).cast("long"), lit(2L))
        .as("par_c"))
    val w = sup.join(cust, Seq("nation", "kmod"))
      .withColumn("score", round(
        lit(6.569856) +
          when(col("band_s") === col("band_c"), lit(2.959358))
            .otherwise(lit(-1.600904)) +
          when(col("par_s") === col("par_c"), lit(0.847997))
            .otherwise(lit(-2.321928)), 6))
      .filter(col("score") > 0)
    w.select(col("nation"), col("s_suppkey"), col("c_custkey"),
        col("score"),
        when(col("score") >= 6, lit("match")).otherwise(lit("possible"))
          .as("decision"))
      .orderBy("nation", "s_suppkey", "c_custkey")
  }

  val q191Oracle: String =
    """WITH sup AS (SELECT s_suppkey, s_nationkey AS nation,
      |    s_suppkey % 100 AS kmod,
      |    CAST(floor(s_acctbal/1000) AS BIGINT) AS band_s,
      |    abs(CAST(round(s_acctbal*100) AS BIGINT)) % 2 AS par_s
      |  FROM supplier),
      |cust AS (SELECT c_custkey, c_nationkey AS nation,
      |    c_custkey % 100 AS kmod,
      |    CAST(floor(c_acctbal/1000) AS BIGINT) AS band_c,
      |    abs(CAST(round(c_acctbal*100) AS BIGINT)) % 2 AS par_c
      |  FROM customer),
      |scored AS (SELECT nation, s_suppkey, c_custkey,
      |    round(6.569856
      |      + CASE WHEN band_s = band_c THEN 2.959358 ELSE -1.600904 END
      |      + CASE WHEN par_s = par_c THEN 0.847997 ELSE -2.321928 END,
      |      6) AS score
      |  FROM sup JOIN cust USING (nation, kmod))
      |SELECT nation, s_suppkey, c_custkey, CAST(score AS DOUBLE) AS score,
      |  CASE WHEN score >= 6 THEN 'match' ELSE 'possible' END AS decision
      |FROM scored WHERE score > 0
      |ORDER BY nation, s_suppkey, c_custkey""".stripMargin

  /** Window width (tokens) for [[q202SubstringDedup]]. 8 tokens ≈ the
    * 50-BPE-token spans of Lee et al. scaled to this corpus's short
    * documents; reuses [[DecontamN]]'s width so the span grammar is
    * the one already exercised by q94/q119.
    */
  val DupSpanW = 8

  /** Exact-substring dedup TRANSFORM — Lee et al., "Deduplicating
    * Training Data Makes Language Models Better" (ACL 2022, arXiv
    * 2107.06499): document-level dedup (q40–q44) drops whole documents,
    * but boilerplate and quoted passages recur across otherwise-unique
    * documents; the Lee et al. remedy EXCISES the duplicated substrings
    * and keeps the rest. Here: a span is a positional 8-token window;
    * it is duplicated when ≥2 distinct documents contain it; per
    * document, duplicated window starts merge into maximal excision
    * intervals (overlapping or touching windows — gap ≤ 8 — coalesce;
    * a gap ≥ 9 starts a new island, leaving the clean tokens between
    * islands in the corpus). Output per document: token count, excised
    * token count, island count, and md5 of the RETAINED token stream —
    * the transform witness q105's audit metric doesn't give. Complement
    * of q105 (per-doc distinct-shingle duplication *fraction*): q105
    * measures, q202 produces the deduplicated corpus.
    *
    * Non-vacuity note: the driver corpus duplicates documents nearly
    * whole, so every gate SF exercises single-island merge (overlap
    * coalescing, full excision, partial head/tail trim) but never the
    * ≥2-island split; DedupSpec pins the split + inter-island retention
    * on synthetic two-passage documents against hand-computed islands.
    *
    * Scale shape (the distributed alternative to a suffix array): every
    * exchange carries (doc_id, 8-byte xxhash64) or (doc_id, start) —
    * never window text; the cross-doc test is one hash-keyed aggregate
    * over per-doc DISTINCT spans; island merge is a per-doc window
    * (state bounded by one document's windows); the rebuild is
    * row-local HOFs over (tokens, islands) — O(n_tokens · n_islands)
    * inside the row, no token-level shuffle. The window stream is
    * re-scanned rather than cached: at 100 TB a token-stream-sized
    * cache is the bottleneck, two parquet scans are not.
    */
  def q202SubstringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedup(documents(s, dir))

  /** Core of [[q202SubstringDedup]] over any (doc_id, text) frame —
    * factored so DedupSpec can pin the multi-island split branch on
    * synthetic two-passage documents (the driver corpus only ever
    * produces single-island excisions; see the non-vacuity note).
    */
  private[graft] def substringDedup(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"),
      graft.functions.Text.tokens(col("text")).as("ws"))
    val sp = docs.select(col("doc_id"),
        posexplode(graft.functions.ShingleExpressions.word_ngrams(
          col("text"), DupSpanW)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
        xxhash64(col("col")).as("h"))
    val dup = sp.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("n_docs_h"))
      .filter(col("n_docs_h") >= 2)
      .select("h")
    val ds = sp.join(dup, Seq("h"), "left_semi").select("doc_id", "i")
    val pw = Window.partitionBy("doc_id").orderBy("i")
    val isl = ds
      .withColumn("nf",
        when(col("i") - lag("i", 1).over(pw) < DupSpanW + 1, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("g", sum("nf").over(pw))
      .groupBy("doc_id", "g")
      .agg(min("i").as("s0"), (max("i") + (DupSpanW - 1)).as("e0"))
    val peri = isl
      .join(w.select(col("doc_id"), size(col("ws")).cast("long").as("nt")),
        Seq("doc_id"))
      .withColumn("e", least(col("e0"), col("nt")))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s0").as("s"), col("e").as("e")))
          .as("isl"),
        count(lit(1)).as("n_islands"),
        sum(col("e") - col("s0") + 1).as("n_cut"))
    w.join(peri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        md5(when(col("isl").isNull, concat_ws(" ", col("ws")))
          .otherwise(concat_ws(" ", filter(col("ws"),
            (x: Column, k: Column) => !exists(col("isl"),
              t => k + 1 >= t("s") && k + 1 <= t("e"))))))
          .as("retained_md5"))
      .orderBy("doc_id")
  }

  val q202Oracle: String = {
    val n = DupSpanW
    s"""WITH w AS (SELECT doc_id, $tokensSql AS ws FROM documents),
      |sp AS (SELECT doc_id, u.i,
      |    array_to_string(ws[u.i:u.i+${n - 1}], ' ') AS s
      |  FROM w, LATERAL unnest(generate_series(1,
      |    CASE WHEN length(ws) >= $n THEN length(ws)-${n - 1}
      |         ELSE 1 END)) AS u(i)),
      |dup AS (SELECT s FROM (SELECT DISTINCT doc_id, s FROM sp)
      |        GROUP BY s HAVING count(*) >= 2),
      |ds AS (SELECT doc_id, i FROM sp WHERE s IN (SELECT s FROM dup)),
      |isl0 AS (SELECT doc_id, i, CASE WHEN lag(i) OVER pw IS NULL
      |      OR i - lag(i) OVER pw >= ${n + 1} THEN 1 ELSE 0 END AS nf
      |  FROM ds WINDOW pw AS (PARTITION BY doc_id ORDER BY i)),
      |isl1 AS (SELECT doc_id, i, sum(nf) OVER
      |    (PARTITION BY doc_id ORDER BY i) AS g FROM isl0),
      |isl AS (SELECT doc_id, min(i) AS s, max(i)+${n - 1} AS e0
      |  FROM isl1 GROUP BY doc_id, g),
      |peri AS (SELECT i.doc_id AS doc_id,
      |    list({'s': i.s, 'e': least(i.e0, length(w.ws))}) AS isl_list,
      |    count(*) AS n_islands,
      |    sum(least(i.e0, length(w.ws)) - i.s + 1) AS n_cut
      |  FROM isl i JOIN w ON i.doc_id = w.doc_id GROUP BY 1)
      |SELECT w.doc_id AS doc_id, CAST(length(w.ws) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(p.n_cut, 0) AS BIGINT) AS n_cut,
      |  CAST(coalesce(p.n_islands, 0) AS BIGINT) AS n_islands,
      |  md5(coalesce(array_to_string(CASE WHEN p.doc_id IS NULL THEN w.ws
      |    ELSE list_filter(w.ws, (x, k) ->
      |      len(list_filter(p.isl_list, t -> k BETWEEN t.s AND t.e)) = 0)
      |    END, ' '), '')) AS retained_md5
      |FROM w LEFT JOIN peri p ON w.doc_id = p.doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** Sorted-neighborhood window size (records) and verify threshold. */
  val SnWindow = 5
  val SnMaxDist = 4

  /** One sorted-neighborhood pass: global rank of the catalog under
    * `key`, then candidate pairs = records within [[SnWindow]] ranks,
    * verified by edit distance. The global rank is the q73 two-phase
    * shape — value-range shards (first key char), driver-side shard
    * offsets (≤ alphabet-sized collect), per-shard row_number — so no
    * catalog-sized frame ever crosses one partition; the rank-band
    * probe is an EXPLODE of the ≤4 rank offsets into an equi join,
    * keeping the candidate stage hash-partitioned rather than a
    * range nested loop.
    */
  private def snPass(s: SparkSession, names: DataFrame, key: Column,
      label: String): DataFrame = {
    val keyed = names.select(col("name"), key.as("k"))
      .withColumn("shard", substring(col("k"), 1, 1))
    val counts = keyed.groupBy("shard").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (sh, c) => val o = acc; acc += c; (sh, o) }
    val offDf = s.createDataFrame(offs.toSeq).toDF("shard", "base")
    val w = Window.partitionBy("shard").orderBy("k", "name")
    val ranked = keyed
      .withColumn("intra", row_number().over(w).cast("long"))
      .join(broadcast(offDf), Seq("shard"))
      .select(col("name"), (col("base") + col("intra")).as("rk"))
    val probes = ranked.select(col("name").as("name1"), col("rk"))
      .withColumn("d", explode(sequence(lit(1L), lit(SnWindow - 1L))))
      .select(col("name1"), (col("rk") + col("d")).as("rk"))
    probes.join(ranked.select(col("name").as("name2"), col("rk")),
        Seq("rk"))
      .withColumn("dist",
        levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= SnMaxDist)
      .select(col("name1"), col("name2"), col("dist"),
        lit(label).as("pass"))
  }

  /** Multi-pass sorted-neighborhood entity resolution (Hernández &
    * Stolfo, SIGMOD 1995) — the third blocking discipline next to
    * token blocking (q147) and LSH (q42/q153): sort the catalog by a
    * key, slide a [[SnWindow]]-record window, verify inside it; a
    * second pass under an independent key (the reversed name) catches
    * pairs the first ordering separates. Candidates are O(w·n) per
    * pass BY CONSTRUCTION — no block can blow up, the property
    * neither token blocking (hot tokens) nor LSH (hot buckets) gives
    * for free — at the price of missing pairs no pass's ordering
    * adjacencies cover; the fwd+rev union is the standard mitigation
    * (measured here: the two passes find entirely disjoint pair
    * sets). Output: verified pairs with pass-coverage counts.
    * DedupSpec pins the both-passes branch on synthetic names (the
    * part catalog never triggers it).
    */
  def q211SortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    sortedNeighborhood(
      part(s, dir).select(col("p_name").as("name")).distinct())

  /** Two-pass (forward + reversed-key) sorted neighborhood over a
    * one-column `name` catalog; null names are dropped (a null key
    * has no place in any ordering).
    */
  def sortedNeighborhood(names: DataFrame): DataFrame = {
    val s = names.sparkSession
    val clean = names.filter(col("name").isNotNull)
    val both = snPass(s, clean, col("name"), "fwd")
      .unionByName(snPass(s, clean, reverse(col("name")), "rev"))
    both.groupBy(
        least(col("name1"), col("name2")).as("n1"),
        greatest(col("name1"), col("name2")).as("n2"))
      .agg(min("dist").as("dist"),
        countDistinct(col("pass")).as("n_passes"))
      .orderBy("n1", "n2")
  }

  val q211Oracle: String = {
    def onePass(keyExpr: String, label: String): String =
      s"""SELECT a.name AS name1, b.name AS name2,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |  '$label' AS pass
        |FROM (SELECT name, row_number() OVER (ORDER BY $keyExpr, name)
        |        AS rk FROM names) a
        |JOIN (SELECT name, row_number() OVER (ORDER BY $keyExpr, name)
        |        AS rk FROM names) b
        |  ON b.rk BETWEEN a.rk + 1 AND a.rk + ${SnWindow - 1}
        |WHERE levenshtein(a.name, b.name) <= $SnMaxDist""".stripMargin
    s"""WITH names AS (SELECT DISTINCT p_name AS name FROM part
      |  WHERE p_name IS NOT NULL),
      |p1 AS (${onePass("name", "fwd")}),
      |p2 AS (${onePass("reverse(name)", "rev")}),
      |allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
      |SELECT least(name1, name2) AS n1, greatest(name1, name2) AS n2,
      |  min(dist) AS dist, count(DISTINCT pass) AS n_passes
      |FROM allp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q260_containment" -> (q260Containment _),
    "q264_jaro_winkler" -> (q264JaroWinklerMatch _),
    "q211_sorted_neighborhood" -> (q211SortedNeighborhood _),
    "q202_substring_dedup" -> (q202SubstringDedup _),
    "q180_semdedup" -> (q180SemDedup _),
    "q184_semdedup_auto" -> (q184SemDedupAuto _),
    "q153_incremental_lsh" -> (q153IncrementalLsh _),
    "q147_er_blocking" -> (q147ErBlocking _),
    "q191_fellegi_sunter" -> (q191FellegiSunter _),
    "q119_leakage_split" -> (q119LeakageSplit _),
    "q130_setsim_join" -> (q130SetSimJoin _),
    "q141_cluster_canonical" -> (q141ClusterCanonical _),
    "q40_exact_dedup" -> (q40ExactDedup _),
    "q41_ngram_jaccard" -> (q41NgramJaccard _),
    "q42_minhash_lsh" -> (q42MinhashLsh _),
    "q43_simhash" -> (q43Simhash _),
    "q57_dedup_clusters" -> (q57DedupClusters _),
    "q67_simhash_near_dup" -> (q67SimhashNearDup _),
    "q74_incremental_dedup" -> (q74IncrementalDedup _),
    "q94_decontaminate" -> (q94Decontaminate _)
  )

  def oracles: Map[String, String] = Map(
    "q260_containment" -> q260Oracle,
    "q264_jaro_winkler" -> q264Oracle,
    "q211_sorted_neighborhood" -> q211Oracle,
    "q202_substring_dedup" -> q202Oracle,
    "q180_semdedup" -> q180Oracle,
    "q184_semdedup_auto" -> q184Oracle,
    "q153_incremental_lsh" -> q153Oracle,
    "q119_leakage_split" -> q119Oracle,
    "q147_er_blocking" -> q147Oracle,
    "q191_fellegi_sunter" -> q191Oracle,
    "q130_setsim_join" -> q130Oracle,
    "q141_cluster_canonical" -> q141Oracle,
    "q40_exact_dedup" -> q40Oracle,
    "q41_ngram_jaccard" -> q41Oracle,
    "q42_minhash_lsh" -> q42Oracle,
    "q43_simhash" -> q43Oracle,
    "q57_dedup_clusters" -> q57Oracle,
    "q67_simhash_near_dup" -> q67Oracle,
    "q74_incremental_dedup" -> q74Oracle,
    "q94_decontaminate" -> q94Oracle
  )
}
