package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("aggregator top-k matches the window formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong % 13, rng.nextDouble() * 100, i.toLong))
      .toDF("g", "v", "id")
    val viaAgg = TopK.topKPerGroup(df, "g", "id", "v", k = 3)
      .select("g", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("g", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all members ranked") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10L), (1L, 7.0, 11L)).toDF("g", "v", "id")
    val got = TopK.topKPerGroup(df, "g", "id", "v", k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(got == Set((11L, 1), (10L, 2)))
  }

  test("skyline2d: strict dominance, same-class losers drop, coincident points tie") {
    import spark.implicits._
    // minimize price, maximize size. (10,5) and (20,9) are the frontier;
    // (10,3) loses to (10,5) in-class; (15,5) loses to (10,5) on price
    // at equal size; (25,9) loses to (20,9); the duplicate (10,5) TIES
    // (coincident points dominate nobody) and both rows survive.
    val df = Seq(
      (1L, 10.0, 5), (2L, 10.0, 3), (3L, 15.0, 5),
      (4L, 20.0, 9), (5L, 25.0, 9), (6L, 10.0, 5))
      .toDF("id", "price", "size")
    val got = TopK.skyline2d(df, "price", "size")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 6L))
  }
}
