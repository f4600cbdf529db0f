package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership probe over a LONG column — the codegen form
  * of `udf((gh: Long) => bc.value.mightContainLong(gh))`, which was the
  * one remaining lambda UDF in a hot path (the decontamination prefilter,
  * [[graft.operators.Dedup.contaminationPairsBloom]]): a closure UDF
  * forces a codegen boundary and boxes every input, while this expression
  * stays inside whole-stage codegen with one virtual call per row.
  *
  * The filter rides along as a `Broadcast` HANDLE (bytes ship once per
  * executor via torrent broadcast, not once per task in the plan); the
  * generated class resolves `.value()` ONCE into a mutable member at
  * operator init, so the per-row work is exactly
  * `filter.mightContainLong(gh)` — the same few XXH64 probes the
  * interpreted UDF paid, minus the boxing and the codegen fence.
  *
  * Scale note: at 100 TB this sits map-side on every corpus shingle;
  * removing the UDF keeps the scan→explode→probe→partial-count pipeline
  * in ONE WholeStageCodegen span.
  */
case class BloomMightContainLong(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomClass = classOf[BloomFilter].getName
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcClass)
    // resolve the broadcast once per generated-operator instance, not per row
    val filterTerm = ctx.addMutableState(bloomClass, "bloomFilter",
      v => s"$v = ($bloomClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filterTerm.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomProbe {
  /** Column form (no registry needed). */
  def mightContainLong(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftBridge.column(BloomMightContainLong(GraftBridge.expression(c), bloom))
}
