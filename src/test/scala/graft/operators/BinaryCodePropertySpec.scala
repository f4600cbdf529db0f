package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: the Column-tree binary encoder and its JVM twin produce the
  * same 60-bit code for arbitrary float vectors — including zeros (sign
  * test is strictly >0) and negative-zero. */
class BinaryCodePropertySpec extends SparkSpec {

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(64, Gen.oneOf(
      Gen.choose(-2.0f, 2.0f), Gen.const(0.0f), Gen.const(-0.0f)))

  test("binaryEncode == binaryEncodeJvm on arbitrary vectors") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(6, genVec)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val enc = Similarity.binaryEncode(df, "embedding", "vec_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        enc(i.toLong) == Similarity.binaryEncodeJvm(v)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
