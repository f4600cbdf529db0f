package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** CMS invariants on arbitrary key multisets: estimates never undercount
  * (the one-sided error guarantee the structure exists for), per-row cell
  * mass conserves the input size, and the sketch is partitioning-
  * independent (a pure aggregation under a pinned hash must be).
  */
class CountMinPropertySpec extends SparkSpec {

  private val genKeys: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))

  test("CMS property: one-sided error, mass conservation, repartition-stable") {
    import spark.implicits._
    val prop = Prop.forAll(genKeys) { keys =>
      val df = keys.toDF("k")
      val depth = 3
      val width = 16
      val audit = CountMin.audit(df, "k", depth, width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val oneSided = audit.forall { case (k, t, est) =>
        t == truth(k) && est >= t
      }
      val sk = CountMin.build(df, "k", depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val massOk = (0 until depth).forall { d =>
        sk.collect { case (`d`, _, c) => c }.sum == keys.size.toLong
      }
      val sk2 = CountMin.build(df.repartition(7), "k", depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val stable = sk.sorted.toSeq == sk2.sorted.toSeq
      oneSided && massOk && stable
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
