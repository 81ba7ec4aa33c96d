// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-text totality: every query that consumes the documents
  * table must run against hostile strings — emoji runs, RTL scripts,
  * CJK without spaces, zero-width joiners, control characters, astral
  * plane, case-folding traps, a whitespace-only doc, and a MEGABYTE
  * single token. The last one is the scale trap this spec exists for:
  * per-word char-level ops (`substring` seeks from the string head)
  * can go quadratic in word length, and one binary-blob "word" in a
  * web crawl would stall a stage for zero value — q172's BPE pair
  * extraction did exactly that until its trainer-conventional
  * word-length cap landed. Whitespace-only docs also divided q103's
  * stopword ratio by zero, and suffix-less source names failed q89's
  * ANSI cast.
  */
class AdversarialTextSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // the queries that read documents.text (the rest never see a string
  // from this table — running them here would only re-run NullInputSpec)
  private val textQueries = Seq(
    "q30_token_stats", "q31_quality_score", "q32_lang_id",
    "q33_fingerprint", "q40_exact_dedup", "q41_ngram_jaccard",
    "q42_minhash_lsh", "q43_simhash", "q56_bpe_tokens",
    "q57_dedup_clusters", "q66_tfidf_top_terms", "q67_simhash_near_dup",
    "q71_clean_text", "q72_chunks", "q73_packing",
    "q74_incremental_dedup", "q76_lm_score", "q78_capped_sample",
    "q89_training_mix", "q93_shard_export", "q94_decontaminate",
    "q95_repetition_stats", "q103_quality_strata", "q105_dup_passages",
    "q107_c4_filter", "q118_stride_chunks", "q119_leakage_split",
    "q130_setsim_join", "q133_rebalance_plan", "q141_cluster_canonical",
    "q142_bm25_topk", "q147_er_blocking", "q153_incremental_lsh",
    "q170_string_indexer", "q172_bpe_merge", "q173_pair_lift",
    "q47_media_features", "q68_media_resize", "q69_frame_sample")

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_sfadv").toString
    val src = "/root/testdata/sf0.001"
    Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .foreach { f =>
        val name = Paths.get(f).getFileName.toString
        if (name != "documents.parquet")
          Files.copy(Paths.get(f), Paths.get(dir, name),
            StandardCopyOption.REPLACE_EXISTING)
      }
    val texts = Seq(
      "😀🎉🔥 " * 50, // emoji runs
      "مرحبا بالعالم " * 30, // RTL arabic
      "日本語のテキストです。" * 40, // CJK, no spaces
      "a​​b c‍d " * 20, // zero-width joins
      "x" * 1000000, // ONE megabyte token
      "tab\tsep\nnewline\rcar ctrl",
      "ﬁﬂﬀ ligatures ß ẞ İ ı",
      "𝔘𝔫𝔦 astral " * 10,
      "normal words mixed with 😀 and 中文",
      " ", // whitespace only
      "word")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "adv", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/tmp_docs")
    val part = Files.list(Paths.get(s"$dir/tmp_docs")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(dir, "documents.parquet"))
    dir
  }

  test("document-consuming queries are total on hostile text") {
    val failures = textQueries.flatMap { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"unknown query in list: $name"))
      val t0 = System.nanoTime()
      val r =
        try { fn(spark, advDir).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("")
                .linesIterator.take(1).mkString.take(140))
        }
      // the megabyte token must not stall any per-word kernel
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt > 60) fail(s"$name took ${dt}s on a 12-doc corpus")
      r
    }
    assert(failures.isEmpty,
      failures.mkString(
        s"${failures.size} queries died on adversarial text:\n  ",
        "\n  ", ""))
  }
}
