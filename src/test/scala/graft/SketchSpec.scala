package graft

import org.apache.spark.sql.functions._

/** q_approx_sketch has no SQL oracle (sketch internals are engine-specific);
  * this spec pins its accuracy against the exact aggregates instead. */
class SketchSpec extends SparkSpec {

  test("approx sketches land within error bounds of exact aggregates") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q_approx_sketch")(spark, dir)
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x_part"),
        countDistinct(col("l_suppkey")).as("x_supp"),
        expr("percentile(l_extendedprice, 0.5)").as("x_p50"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ndPart, ndSupp) = (r.getAs[Long]("nd_part"), r.getAs[Long]("nd_supp"))
      val (xPart, xSupp) = (r.getAs[Long]("x_part"), r.getAs[Long]("x_supp"))
      // default rsd 5% (allow 4 sigma); nd_supp uses rsd 1%
      assert(math.abs(ndPart - xPart).toDouble / xPart < 0.20, s"nd_part $ndPart vs $xPart")
      assert(math.abs(ndSupp - xSupp).toDouble / xSupp < 0.05, s"nd_supp $ndSupp vs $xSupp")
      val (p50, xP50) = (r.getAs[Double]("p50"), r.getAs[Double]("x_p50"))
      assert(math.abs(p50 - xP50) / xP50 < 0.02, s"p50 $p50 vs $xP50")
    }
  }
}
