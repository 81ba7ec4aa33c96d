// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ShingleExpressions.WordNGrams
import graft.functions.VectorExpressions.{CosineSimilarity, DotProduct}

/** Cluster-wide installation point for the engine's native expressions.
  *
  * `GraftSql.registerFunctions` covers the per-session programmatic
  * path; this class is the declarative one — a user (or a platform
  * operator on a 1000-executor cluster) sets
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every session created from that conf can call
  * `graft_cosine_similarity(a, b)` / `graft_dot_product(a, b)` from
  * plain SQL with no graft import on the call site. The functions
  * resolve to the same whole-stage-codegen Catalyst expressions the
  * DataFrame API uses (`functions/VectorExpressions.scala`), so SQL
  * and DataFrame callers get identical plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "graft_cosine_similarity"),
      (exprs: Seq[Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_ngrams"),
      (exprs: Seq[Expression]) =>
        graft.functions.ShingleExpressions.wordNGramsFromExprs(exprs)))
    // the custom whole-operator path: plans TopKPerGroupNode as
    // partial → exchange → final bounded-heap execs, with the
    // group-filter pushdown rule alongside
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroup.Strategy)
    ext.injectOptimizerRule(_ =>
      graft.plans.TopKPerGroup.PushFilterThroughTopK)
  }
}
