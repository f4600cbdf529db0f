package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
  }

  test("estimate never undercounts and is exact without collisions") {
    // width large enough that 3 keys cannot collide in every row
    val audit = CountMin.audit(df, "k", depth = 4, width = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(audit.map(t => t._1 -> t._2) == Seq(1L -> 5L, 2L -> 3L, 3L -> 1L))
    audit.foreach { case (k, truth, est) =>
      assert(est >= truth, s"CMS undercounted key $k: $est < $truth")
    }
    // 4 independent 1024-wide rows over 3 keys: overwhelmingly exact
    assert(audit.forall { case (_, truth, est) => est == truth })
  }

  test("tiny width forces visible overcounts but never undercounts") {
    val audit = CountMin.audit(df, "k", depth = 1, width = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    audit.foreach { case (truth, est) => assert(est >= truth) }
    // 3 keys into 2 buckets: pigeonhole guarantees at least one overcount
    assert(audit.exists { case (truth, est) => est > truth })
  }

  test("sketch is broadcast-sized: at most depth x width cells") {
    val sk = CountMin.build(df, "k", depth = 4, width = 8)
    assert(sk.count() <= 32)
    // total mass per row equals the input cardinality
    val mass = sk.groupBy(col("d")).agg(sum(col("cnt")).as("m"))
      .collect().map(_.getLong(1)).toSeq
    assert(mass == Seq.fill(4)(9L))
  }
}
