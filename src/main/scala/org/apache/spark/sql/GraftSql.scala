// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * the supported pattern for libraries shipping native Catalyst
  * expressions (the public `Column` API in Spark 4 no longer exposes
  * `expr`/the Expression constructor directly).
  */
object GraftSql {
  def columnOf(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built LogicalPlan (e.g. a custom operator node) back
    * into the public DataFrame API.
    */
  def datasetOf(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Driver-local rows of a frame whose ANALYZED plan is already a
    * [[catalyst.plans.logical.LocalRelation]]: extracted straight from
    * the relation's InternalRows — no optimizer pass, no physical
    * planning, no Spark job. The metadata-sized commit path calls this
    * hundreds of times per lifecycle (one per tiny commit), where the
    * full `collect()` pipeline costs a few ms of pure fixed overhead
    * each.
    */
  def localRelationRows(df: DataFrame,
      maxRows: Int): Option[Seq[Row]] =
    df.queryExecution.analyzed match {
      case l: catalyst.plans.logical.LocalRelation
          if l.data.length <= maxRows =>
        val conv = catalyst.CatalystTypeConverters
          .createToScalaConverter(l.schema)
        Some(l.data.map(r => conv(r).asInstanceOf[Row]))
      case _ => None
    }

  /** Register the engine's native expressions for SQL callers:
    * `SELECT graft_cosine_similarity(a, b)` / `graft_dot_product(a, b)`.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_cosine_similarity",
      exprs => graft.functions.VectorExpressions.CosineSimilarity(
        exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_dot_product",
      exprs => graft.functions.VectorExpressions.DotProduct(
        exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_word_ngrams",
      exprs => graft.functions.ShingleExpressions
        .wordNGramsFromExprs(exprs), "built-in")
  }
}
