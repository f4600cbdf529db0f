package graft

import org.apache.spark.sql.functions._

/** q_approx_sketch is oracle-exact (pinned-md5 HLL + deterministic
  * hash-sample quantiles); this spec pins its statistical accuracy
  * against the exact aggregates — the bound the oracle can't check.
  */
class SketchSpec extends SparkSpec {

  test("pinned sketches land within error bounds of exact aggregates") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q_approx_sketch")(spark, dir)
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x_part"),
        countDistinct(col("l_orderkey")).as("x_order"),
        expr("percentile(l_extendedprice, 0.5)").as("x_p50"),
        count(lit(1)).as("x_n"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // m=64 registers → σ ≈ 1.04/√64 = 13%; allow ~3.5σ
      val (ndPart, ndOrder) =
        (r.getAs[Double]("nd_part_est"), r.getAs[Double]("nd_order_est"))
      val (xPart, xOrder) = (r.getAs[Long]("x_part"), r.getAs[Long]("x_order"))
      assert(math.abs(ndPart - xPart) / xPart < 0.45, s"nd_part $ndPart vs $xPart")
      assert(math.abs(ndOrder - xOrder) / xOrder < 0.45, s"nd_order $ndOrder vs $xOrder")
      // self-audit column equals the recomputed relative error
      val relErr = r.getAs[Double]("rel_err_part")
      assert(math.abs(relErr - (ndPart - xPart) / xPart) < 1e-4)
      // 1-in-8 sample: median within 10%, sample size within 3σ of n/8
      val (p50, xP50) = (r.getAs[Double]("p50_est"), r.getAs[Double]("x_p50"))
      assert(math.abs(p50 - xP50) / xP50 < 0.10, s"p50 $p50 vs $xP50")
      val (nSample, xN) = (r.getAs[Long]("n_sample"), r.getAs[Long]("x_n"))
      val expect = xN / 8.0
      assert(math.abs(nSample - expect) < 3 * math.sqrt(expect) + 10,
        s"n_sample $nSample vs expected ~$expect of $xN")
    }
  }
}
