// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling — the innermost kernel of the dedup /
  * decontamination / passage-audit family (q41/q94/q105), as a
  * codegen'd Catalyst expression.
  *
  * Why an expression and not the posexplode + window-`lead` compose:
  * the window variant shuffles and sorts the ENTIRE token stream by
  * doc_id just to pair each token with its n−1 successors — at 100 TB
  * that exchange dwarfs the useful work. Shingling is a per-ROW
  * computation (a document's shingles depend on nothing else), so this
  * expression emits `array<string>` of n-grams inside the scan task:
  * zero shuffle, stays in whole-stage codegen, and `explode` (a
  * built-in Generate) restores the row-per-shingle shape downstream.
  *
  * Semantics (must match the dedup family's established contract and
  * every oracle's list-comprehension: tokens = space-split minus
  * empties; length ≥ n → one shingle per position, joined with ' ';
  * shorter documents contribute ONE whole-document shingle).
  *
  * Codegen calls the same static kernel `eval` uses — the JIT inlines
  * it; hand-assembling string-builder Java here would add risk, not
  * speed (the pattern RegExpReplace et al. use).
  */
object ShingleExpressions {

  /** Row-local kernel, shared by interpreted eval and codegen. */
  def ngramsKernel(input: UTF8String, n: Int): GenericArrayData = {
    val toks0 = input.toString.split(" ")
    var m = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) m += 1; i += 1 }
    val toks = new Array[String](m)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    val out: Array[Any] =
      if (m >= n) {
        val res = new Array[Any](m - n + 1)
        var p = 0
        while (p <= m - n) {
          val sb = new java.lang.StringBuilder()
          var q = 0
          while (q < n) {
            if (q > 0) sb.append(' ')
            sb.append(toks(p + q))
            q += 1
          }
          res(p) = UTF8String.fromString(sb.toString)
          p += 1
        }
        res
      } else {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      }
    new GenericArrayData(out)
  }

  /** Null-text contract: as a standard null-intolerant UnaryExpression,
    * NULL text yields NULL (and `explode` then drops the document) —
    * unlike the replaced posexplode formulation, where size(null) = -1
    * hit the short-document branch and contributed one empty-string
    * shingle. The driver testdata guarantees non-null `documents.text`,
    * so the engines agree; a corpus with NULL text must decide
    * explicitly: `coalesce(text, '')` to keep the document, or
    * `explode_outer` to keep a null-shingle row.
    */
  case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression {

    require(n >= 1, s"n-gram size must be >= 1, got $n")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any =
      ngramsKernel(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ShingleExpressions.ngramsKernel($c, $n)")

    override protected def withNewChildInternal(newChild: Expression)
        : Expression = copy(child = newChild)
  }

  def word_ngrams(c: Column, n: Int): Column =
    GraftSql.columnOf(WordNGrams(GraftSql.expressionOf(c), n))

  /** Validated SQL-registration constructor for
    * `graft_word_ngrams(text, n)`: n must be a foldable INT literal.
    * Checked up front so a column or BIGINT/string literal fails with
    * a readable contract message instead of an opaque
    * ClassCastException at eval time. (Spark 4 removed
    * AnalysisException's plain-string constructor, so the message
    * travels via IllegalArgumentException — what `require` throws —
    * which the parser surfaces verbatim.)
    */
  def wordNGramsFromExprs(exprs: Seq[Expression]): WordNGrams = {
    require(exprs.length == 2,
      "graft_word_ngrams(text, n) takes exactly 2 arguments")
    val nExpr = exprs(1)
    require(nExpr.foldable && nExpr.dataType == IntegerType,
      "graft_word_ngrams(text, n): n must be an integer literal, got " +
        s"${nExpr.sql} of type ${nExpr.dataType.simpleString}")
    val v = nExpr.eval()
    require(v != null, "graft_word_ngrams(text, n): n must not be NULL")
    WordNGrams(exprs.head, v.asInstanceOf[Int])
  }
}
