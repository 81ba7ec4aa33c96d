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
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.filter(mightContainLong(big(bigKey), bloom))
  }

  def mightContainLong(c: Column, bloom: BloomFilter): Column =
    GraftSql.columnOf(BloomMightContainLong(GraftSql.expressionOf(c), bloom))
}
