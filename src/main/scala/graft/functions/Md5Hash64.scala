package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit hash:
  * top 15 hex digits of md5, as a non-negative LONG — the exact value of
  * `conv(substring(md5(c), 1, 15), 16, 10)` but computed in one step.
  *
  * The built-in chain allocates a 32-char hex string, substrings it, and
  * runs NumberConverter base conversion per row; this expression digests
  * straight to the long (thread-local MessageDigest, zero intermediate
  * strings) and participates in whole-stage codegen via a static call —
  * ~3× less per-row cost on hash-bound operators (embedding, MinHash,
  * SimHash, fingerprints). Values are identical, so external SQL oracles
  * (`CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`) still agree.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash64 expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex digits = first 60 bits: big-endian first 8 bytes >>> 4
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Column form (no registry needed). */
  def apply(c: Column): Column =
    GraftBridge.column(Md5Hash64(GraftBridge.expression(c)))
}

/** Session-level registration so the engine's native expressions are
  * callable from SQL text (`SELECT cosine_sim(a, b) ...`). Two routes:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide, applied at session build)
  *  - runtime: `GraftFunctions.register(spark)` (existing session)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftFunctions {
  /** (sql name, implementing class, builder) for every native expression. */
  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_hash64", classOf[Md5Hash64],
      (children: Seq[Expression]) => Md5Hash64(children.head)),
    ("cosine_sim", classOf[CosineSim],
      (children: Seq[Expression]) => CosineSim(children(0), children(1))),
    ("dot_product", classOf[DotProduct],
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    ("jaro_winkler", classOf[JaroWinkler],
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
