// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Explicit Bloom-filter join pruning — the manual form of the
  * runtime-filter / semi-join-pushdown technique: build a Bloom filter
  * over the small side's join keys (driver-coordinated aggregate, the
  * same way Spark's own runtime filters are built), ship it to the
  * executors as one plan reference, and drop big-side rows that cannot
  * match BEFORE they reach the join's shuffle.
  *
  * When it matters at 100 TB: a selective semi join whose build side is
  * too big to broadcast as rows but whose key BLOOM fits in a few MB.
  * The big side's shuffle then carries only probable matches (fpp ≈
  * false-positive rate of extra traffic); correctness is unaffected
  * because the bloom has NO false negatives and the real join still
  * runs after the prune.
  */
object BloomExpressions {

  /** `bloom.mightContainLong(child)` as a codegen'd predicate. The
    * filter is attached as a plan reference object (serialized once
    * per task binary, deserialized once per executor), never re-read
    * per row.
    */
  case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType

    override protected def nullSafeEval(v: Any): Any =
      bloom.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $ref.mightContainLong($v);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Build a bloom over `small`'s `smallKey` (long) and prune `big` to
    * rows whose `bigKey` might match. Follow with the real join —
    * results are exactly the unpruned join's.
    */
  def bloomPrune(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    // a zero-row build side has no filter to build (stat.bloomFilter
    // NPEs on the null merge buffer); unpruned is always correct —
    // the caller's real join still decides
    if (small.isEmpty) big
    else {
      val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
      big.filter(mightContainLong(big(bigKey), bloom))
    }
  }

  def mightContainLong(c: Column, bloom: BloomFilter): Column =
    GraftSql.columnOf(BloomMightContainLong(GraftSql.expressionOf(c), bloom))

  /** Optimal Bloom size in bits for `n` items at false-positive rate
    * `p` (standard formula m = -n·ln p / (ln 2)²).
    */
  def optimalBits(n: Long, p: Double): Long =
    math.ceil(-n.max(1L) * math.log(p) /
      (math.log(2) * math.log(2))).toLong

  /** Best achievable false-positive rate for `n` items in `bits` bits
    * with the optimal hash count: p ≈ e^(-(m/n)·(ln 2)²).
    */
  def achievableFpp(n: Long, bits: Long): Double =
    math.exp(-(bits.toDouble / n.max(1L)) * math.log(2) * math.log(2))

  /** Build a Bloom filter over `df(key)` bounded by a BYTE budget, or
    * decline. A plan-referenced bloom is a driver-side object shipped
    * inside every task binary, so its size must NOT scale with the
    * data: at the target fpp the optimal filter grows ~1.2 bytes/key,
    * which is ~1 MB at 10⁶ keys but ~120 MB at 10⁸ and driver-fatal
    * at 10⁹. Under the cap we build at the target fpp; over it we
    * build AT the cap if the cap-constrained fpp is still selective
    * (≤ `maxFpp`), and return None once the capped filter would pass
    * most keys anyway — a prune that drops <(1-maxFpp) of rows isn't
    * worth a multi-MB task-binary tax. Callers treat None as "run the
    * unpruned join": the prune is an optimization, never a semantic.
    */
  def boundedBloomFilter(df: DataFrame, key: String, expectedItems: Long,
      maxBytes: Long, fpp: Double = 0.01,
      maxFpp: Double = 0.25): Option[BloomFilter] = {
    // zero keys: nothing to build (stat.bloomFilter NPEs on the null
    // merge buffer of an empty aggregation) — None = run unpruned
    if (expectedItems <= 0) return None
    val n = expectedItems
    val capBits = maxBytes * 8
    if (optimalBits(n, fpp) <= capBits)
      Some(df.stat.bloomFilter(key, n, fpp))
    else if (achievableFpp(n, capBits) <= maxFpp)
      Some(df.stat.bloomFilter(key, n, capBits))
    else None
  }
}
