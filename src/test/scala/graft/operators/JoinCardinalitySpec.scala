package graft.operators

import graft.SparkSpec

/** The estimate must equal the true join size — it's exact arithmetic,
  * not an estimate, and that's the point. */
class JoinCardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("joinCardinality equals the materialized join, ranked by contribution") {
    val left = Seq(1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 2L, 2L, 2L).toDF("j")
    val out = Profiling.joinCardinality(left, "k", right, "j", k = 10).collect()
    val trueSize = left.join(right, left("k") === right("j")).count()
    assert(out.map(_.getAs[Long]("pairs")).sum == trueSize)
    assert(out.head.getAs[Long]("key") == 2L) // 1×3 beats 2×1
    assert(out.head.getAs[Long]("pairs") == 3L)
    assert(out.head.getAs[Double]("share") == 0.6)
    assert(out.forall(_.getAs[Long]("total_pairs") == trueSize))
  }
}
