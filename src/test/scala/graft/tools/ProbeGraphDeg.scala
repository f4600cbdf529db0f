package graft.tools

import graft.Tables
import graft.operators.{Graph, MarketBasket}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: degree distribution of the co-purchase graph at a
  * given SF dir, to pick a hubMax that actually binds for the
  * graph_link_predict_capped gate. */
object ProbeGraphDeg {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = MarketBasket.frequentPairs(Tables.lineitem(spark, dir),
      "l_orderkey", "l_partkey", minSupport = 2)
      .select(col("a"), col("b"))
      .persist()
    val e = edges.count()
    println(s"PROBE edges=$e hubMaxFor=${Graph.hubMaxFor(e)}")
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    deg.agg(count(lit(1)).as("nv"), max("d").as("maxd"),
      expr("percentile(d, array(0.5, 0.9, 0.99))").as("pct"))
      .collect().foreach(r => println(s"PROBE deg: $r"))
    deg.orderBy(col("d").desc).limit(12).collect()
      .foreach(r => println(s"PROBE top: $r"))
    spark.stop()
  }
}
