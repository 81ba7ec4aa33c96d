// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.ops.Pseudonymise.{FreeText, TableConfig}

/** Feature-extraction orchestration, faithful to the reference
  * (patient_notes/src/patient_notes/stages/feature_extraction.py:54-120):
  *
  *  - skip when no free-text columns configured;
  *  - probe size with `take(100)` (never a full count);
  *  - large path: `repartition(max(32, current))`, `randomSplit` into
  *    one sub-frame per "key" (the reference shards across rate-limited
  *    API keys; the orchestration is preserved so a rate-limited
  *    annotator can slot in), per-split annotate → project PKs +
  *    extracted column → join back on PKs → fold-union;
  *  - small path: annotate whole frame with one key.
  *
  * The annotator is injected per key (mirrors the `analyse` seam the
  * reference's tests patch); `defaultAnnotator` ignores the key index
  * and uses the local [[graft.functions.HealthAnnotator]].
  *
  * Scale note: the join-back is PK-equi on the randomSplit-derived
  * sub-frames; both sides stem from the same repartitioned parent so
  * Catalyst plans a shuffle only on the (small) projected side when
  * broadcast applies. The deterministic seed keeps results reproducible
  * for the oracle gate.
  *
  * Known reference-faithful quirk: a change-set carrying more than one
  * row per PK (insert + delete of the same key in one CDC batch)
  * multiplies through the PK join-back exactly as the reference's
  * `sub_dfs[i].join(sub_df, primary_keys)` does
  * (feature_extraction.py:100-108); the downstream merge inserts the
  * duplicates like Delta's whenNotMatchedInsertAll would. Deduplicate
  * upstream if a source can emit same-PK insert+delete batches.
  */
object Extract {

  /** config.py:26 */
  val ExtractedSuffix = "_extracted"
  /** config.py:29-31 — WORKER_COUNT * CORE_COUNT */
  val TargetPartitions = 32
  /** feature_extraction.py randomSplit determinism for tests/oracles. */
  val SplitSeed = 42L

  type Annotator = (DataFrame, String, Int) => DataFrame

  /** `analyse` (feature_extraction.py:30-51): add `<col>_extracted`. */
  def defaultAnnotator: Annotator = (df, column, _keyIndex) =>
    df.withColumn(column + ExtractedSuffix,
      graft.functions.HealthAnnotator.annotateUdf(col(column)))

  def extractFeatures(df: DataFrame, tableName: String, config: TableConfig,
      numKeys: Int, annotator: Annotator = defaultAnnotator): DataFrame = {
    val freeTextCols = config.columnTypes.collectFirst {
      case (FreeText, cols) => cols
    }
    freeTextCols match {
      case None => df // feature_extraction.py:79-85 — nothing to extract
      case Some(columns) =>
        val isLarge = df.take(100).length == 100
        if (isLarge) {
          val repartitioned = df.repartition(
            math.max(TargetPartitions, df.rdd.getNumPartitions))
          var subDfs = repartitioned
            .randomSplit(Array.fill(numKeys)(1.0), SplitSeed)
          for (column <- columns) {
            for (i <- subDfs.indices) {
              val annotated = annotator(subDfs(i), column, i)
                .select(column + ExtractedSuffix, config.primaryKeys: _*)
              subDfs(i) = subDfs(i).join(annotated, config.primaryKeys)
            }
          }
          subDfs.reduce(_ union _)
        } else {
          // small path: one deterministic key (the reference picks
          // random.choice; seeded here for reproducibility)
          columns.foldLeft(df)((d, c) => annotator(d, c, 0))
        }
    }
  }
}
