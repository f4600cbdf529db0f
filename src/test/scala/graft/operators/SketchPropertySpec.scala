package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** KMV and Misra-Gries invariants on arbitrary key multisets — the
  * guarantees each structure exists for, checked under random data and
  * random partitioning:
  *  - KMV: the sketch IS the k smallest distinct hashes (order statistic
  *    — exact, permutation- and partitioning-independent), and an
  *    under-full sketch holds every distinct value;
  *  - MG: every item with frequency > n/(k+1) is present, estimates
  *    never overcount and undercount by at most n/(k+1) — for EVERY
  *    retained item, under any partitioning (merge order varies the
  *    counts, never the contract).
  */
class SketchPropertySpec extends SparkSpec {

  private val genKeys: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-30L, 30L))

  test("KMV property: exact k-min order statistic, partition-independent") {
    import spark.implicits._
    val prop = Prop.forAll(genKeys, Gen.chooseNum(2, 12)) { (keys, k) =>
      val df = keys.map(x => (x, "g")).toDF("k", "g")
      val got = Kmv.build(df, "k", "g", k).collect()(0).getSeq[Long](1)
      val expect = keys.distinct
        .map(x => HashFunctions.hash64Jvm(x.toString)).distinct
        .sorted.take(k)
      val stable = Kmv.build(df.repartition(5), "k", "g", k)
        .collect()(0).getSeq[Long](1) == got
      got == expect && stable
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("MG property: frequent-presence + error band for all retained items") {
    import spark.implicits._
    val prop = Prop.forAll(genKeys, Gen.chooseNum(2, 8),
        Gen.chooseNum(1, 9)) { (keys, k, parts) =>
      val df = keys.map(_.toString).toDF("item").repartition(parts)
      val n = keys.size.toLong
      val thr = n / (k + 1)
      val truth = keys.groupBy(identity)
        .map { case (x, v) => x.toString -> v.size.toLong }
      val sk = MisraGries.sketch(df, "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizeOk = sk.size <= k
      val presence = truth.forall { case (item, cnt) =>
        cnt <= thr || sk.contains(item)
      }
      val band = sk.forall { case (item, est) =>
        val t = truth(item)
        est <= t && (t - est) <= thr
      }
      sizeOk && presence && band
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
