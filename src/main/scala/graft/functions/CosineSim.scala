package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two numeric array columns.
  *
  * One tight loop over the underlying ArrayData per row (single pass
  * accumulating dot and both norms), participating in whole-stage codegen
  * through a static call — versus 3·dims `element_at` expression nodes for
  * the unrolled Column form, or interpreted per-element lambdas for the
  * HOF form. Accumulation is left-to-right in Double, identical to the
  * engine's Column forms, so scores stay bit-compatible with the external
  * SQL oracles.
  *
  * Returns NULL when either input is NULL, the lengths differ, any
  * element is NULL, or either norm is zero — the same cases where the
  * Column forms yield NULL (element_at past the end and null elements
  * both null out the whole fold; zero norms hit the nullif).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

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
      s"cosine_sim expects ARRAY<FLOAT|DOUBLE>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val leftIsFloat = elemType(left) == FloatType
  private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = leftIsFloat
    val rf = rightIsFloat
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double ${ev.value}_r = graft.functions.CosineSim.cosine($a, $b, $lf, $rf);
         |if (Double.isNaN(${ev.value}_r)) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Single-pass cosine; returns NaN for zero norms, mismatched lengths,
    * and null elements (all mapped to NULL by the expression).
    * Accumulation order matches the Column-form left fold. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
