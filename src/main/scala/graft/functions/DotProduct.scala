package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns.
  *
  * The hot use is LSH sign projections ([[VectorFunctions.rhpBucket]]):
  * `planes` dot products of a row vector against ±1 hyperplane literals.
  * The unrolled Column form is 3·dims expression nodes PER PLANE (a
  * 64-dim × 4-plane bucket is ~800 nodes, blowing past codegen limits);
  * this is one codegen'd static call per plane. Accumulation is
  * left-to-right in Double — bit-identical to the unrolled/HOF forms.
  *
  * Returns NULL when either input is NULL, lengths differ, any element is
  * NULL, or the accumulated sum is NaN (the Column forms return NaN for
  * the last case — see [[DotProduct.dot]] for why that divergence is safe
  * for every in-engine caller).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects ARRAY<FLOAT|DOUBLE>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private lazy val leftIsFloat = elemType(left) == FloatType
  private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = leftIsFloat
    val rf = rightIsFloat
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double ${ev.value}_r = graft.functions.DotProduct.dot($a, $b, $lf, $rf);
         |if (Double.isNaN(${ev.value}_r)) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Left-to-right Double accumulation; NaN for length mismatch / null
    * elements. The expression maps ANY NaN result to NULL — including a sum
    * poisoned by a genuinely-NaN input element, which the unrolled/HOF
    * Column forms would return as NaN. That is a deliberate divergence: NaN
    * doubles as the structural sentinel here, and the only in-engine
    * consumer ([[VectorFunctions.rhpBucket]]) routes NULL and NaN to the
    * same otherwise-branch, so bucket values are unaffected. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
