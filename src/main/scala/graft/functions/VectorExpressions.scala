// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * runs on the interpreted higher-order-function path — per-element
  * lambda dispatch with null boxing — and dominated the benchmark for
  * the similarity queries. These expressions evaluate in a tight
  * primitive loop over `ArrayData` and participate in whole-stage
  * codegen via `doGenCode`, the preference order the engine follows for
  * operators Spark lacks (custom Expression before UDF).
  */
object VectorExpressions {

  /** cosine(a, b) = <a,b> / (|a|·|b|) computed in one pass; null if
    * either input is null. Degenerate inputs read as 0.0 — "no
    * similarity evidence" — NOT IEEE NaN: zero norms, NaN/Inf
    * elements, overflowing magnitudes, and MISMATCHED dimensionality
    * all clamp to 0.0, because Spark SQL orders NaN above every double
    * (`NaN >= τ` is TRUE) and a prefix-cosine over unequal lengths is
    * promiscuously high — either one lets a single corrupt vector pass
    * every τ-threshold and merge unrelated clusters
    * (AdversarialVectorSpec pins the contract).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // Mismatched dimensionality is "no similarity evidence", never a
      // prefix-cosine: a truncated 3-dim vector's prefix-cosine against
      // 64-dim neighbors is near-arbitrary and promiscuously HIGH,
      // which in the τ-thresholded dedup pipelines made one malformed
      // vector a bridge that merged unrelated clean clusters
      // (AdversarialVectorSpec pins this).
      if (x.numElements() != y.numElements()) return 0.0
      val n = x.numElements()
      var dot = 0.0
      var nx = 0.0
      var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
        i += 1
      }
      val c = dot / (math.sqrt(nx) * math.sqrt(ny))
      // Degenerate inputs (zero norm, NaN/Inf elements, overflowing
      // magnitudes) must read as "no similarity evidence" (0.0), never
      // NaN: Spark SQL orders NaN ABOVE every value and NaN >= τ is
      // TRUE, so a single corrupt vector would otherwise pass every
      // τ-threshold and, in the dedup pipelines, merge its whole cell
      // into one bogus cluster. At 100 TB a few corrupt embeddings are
      // a certainty; conservative no-match is the only safe reading.
      if (java.lang.Double.isFinite(c)) c else 0.0
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  if (!java.lang.Double.isFinite(${ev.value})) { ${ev.value} = 0.0; }
         |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(newLeft, newRight)
  }

  /** <a,b> dot product, same execution strategy. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(newLeft, newRight)
  }

  def cosine_similarity(a: Column, b: Column): Column =
    GraftSql.columnOf(CosineSimilarity(
      GraftSql.expressionOf(a), GraftSql.expressionOf(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftSql.columnOf(DotProduct(
      GraftSql.expressionOf(a), GraftSql.expressionOf(b)))
}
