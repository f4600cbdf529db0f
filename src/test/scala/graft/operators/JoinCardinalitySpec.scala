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

  test("fdViolations: keys hold, behavioral pairs count their violation mass") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (3L, "b"), (3L, "b"))
      .toDF("k", "v")
    val out = Profiling.fdViolations(df, Seq(("k", "v"), ("v", "k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("k", "v")) == ((3L, 0L, true)))  // each k maps to one v
    assert(out(("v", "k")) == ((2L, 1L, false))) // 'a' maps to {1,2}
  }
}
