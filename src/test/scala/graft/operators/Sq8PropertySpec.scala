package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of SQ8 scalar quantization on arbitrary vector sets:
  * codes bounded to [0, 255], reconstruction error within half a
  * quantization step per dimension (the affine-map guarantee), and
  * byte-identical codes under repartitioning (the determinism every
  * sampler/quantizer in this engine promises).
  */
class Sq8PropertySpec extends SparkSpec {

  private val dims = 6

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(dims, Gen.chooseNum(-10.0f, 10.0f)).map(_.toSeq)

  test("SQ8 property: bounded codes, half-step error, repartition-stable") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(genVec)) { vecsList =>
      val df = vecsList.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val (mins, maxs) = Similarity.sqCalibrate(df, "embedding")
      val enc = Similarity.sqEncode(df, "embedding", "vec_id", mins, maxs)
      val deq = enc.select(col("vec_id"), col("codes"),
        Similarity.sqDequantize(col("codes"), mins, maxs).as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2)))
      val codesOk = deq.forall(_._2.forall(c => c >= 0 && c <= 255))
      val raw = vecsList.zipWithIndex.map { case (v, i) => i.toLong -> v }.toMap
      val errOk = deq.forall { case (id, _, xq) =>
        raw(id).zip(xq).zipWithIndex.forall { case ((x, q), d) =>
          val step = (maxs(d) - mins(d)) / 255.0
          math.abs(x.toDouble - q) <= step / 2 + 1e-12
        }
      }
      val re = Similarity.sqEncode(df.repartition(7), "embedding", "vec_id",
        mins, maxs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val stableOk = deq.forall { case (id, codes, _) => re(id) == codes }
      codesOk && errOk && stableOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
