package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("build: sketch is the k smallest distinct hashes, any partitioning") {
    val df = (1 to 200).map(i => (s"u$i", "g")).toDF("user", "g")
    val sk = Kmv.build(df, "user", "g", k = 16).collect()
    assert(sk.length == 1)
    val got = sk(0).getSeq[Long](1)
    val expect = (1 to 200).map(i => HashFunctions.hash64Jvm(s"u$i"))
      .distinct.sorted.take(16)
    assert(got == expect)
    assert(sk(0).getLong(2) == 16L)
    // repartitioned input yields the identical sketch (order statistic)
    val sk2 = Kmv.build(df.repartition(7), "user", "g", k = 16).collect()
    assert(sk2(0).getSeq[Long](1) == expect)
  }

  test("build: under-full group holds every distinct value exactly") {
    val df = Seq(("a", "g"), ("b", "g"), ("a", "g")).toDF("user", "g")
    val sk = Kmv.build(df, "user", "g", k = 16).collect()(0)
    assert(sk.getLong(2) == 2L) // duplicates collapse
  }

  test("audit: estimate within a plausible band, exact when under-full") {
    val df = (1 to 500).map(i => (s"u$i", if (i <= 10) "small" else "big"))
      .toDF("user", "g")
    val rows = Kmv.audit(df, "user", "g", k = 64).collect()
      .map(r => r.getString(0) -> r).toMap
    // under-full group: est IS the exact count
    assert(rows("small").getDouble(2) == 10.0)
    assert(rows("small").getLong(1) == 10L)
    // full sketch: k=64 over 490 distinct — KMV std err ~ 1/sqrt(k-2) ~ 13%
    val big = rows("big")
    assert(big.getLong(1) == 490L)
    assert(math.abs(big.getDouble(4)) < 0.5, s"rel_err ${big.getDouble(4)}")
  }

  test("intersectAudit: exact side right; estimates track the overlap") {
    // A = 1..300, B = 201..500 -> inter 100, union 500
    val df = ((1 to 300).map(i => (s"u$i", "A")) ++
      (201 to 500).map(i => (s"u$i", "B"))).toDF("user", "g")
    val r = Kmv.intersectAudit(df, "user", "g", "A", "B", k = 64).collect()(0)
    assert(r.getLong(0) == 300L && r.getLong(1) == 300L)
    assert(r.getLong(2) == 500L && r.getLong(3) == 100L)
    val estInter = r.getDouble(8)
    assert(estInter > 20 && estInter < 300, s"est_inter $estInter")
    // jaccard estimate near 0.2 (100/500), generous sketch band
    val j = r.getDouble(7)
    assert(j > 0.02 && j < 0.6, s"jaccard_est $j")
  }

  test("intersectAudit: disjoint groups estimate zero intersection") {
    val df = ((1 to 200).map(i => (s"a$i", "A")) ++
      (1 to 200).map(i => (s"b$i", "B"))).toDF("user", "g")
    val r = Kmv.intersectAudit(df, "user", "g", "A", "B", k = 32).collect()(0)
    assert(r.getLong(3) == 0L)
    assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0)
  }
}
