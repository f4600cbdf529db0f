package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for graph_bfs_distances: where do the ~25s go —
  * the frequent-pairs edge derivation, the seed derivation, or the
  * per-round frontier expansion? */
object ProbeBfs {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val edges = graft.operators.MarketBasket.frequentPairs(
      graft.Tables.lineitem(s, d), "l_orderkey", "l_partkey", minSupport = 2)
      .select(col("a"), col("b"))
    t("frequentPairs count") { println("edges=" + edges.count()) }
    val ck = t("edges checkpoint") { edges.localCheckpoint() }
    val nodes = ck.select(col("a").as("node"))
      .unionAll(ck.select(col("b").as("node"))).distinct()
    val seeds = nodes.where(col("node") % 50 === 0)
    t("seeds count") { println("seeds=" + seeds.count()) }
    for (r <- 1 to 3)
      t(s"bfs rounds=$r (ckpt edges)") {
        println("known=" + graft.operators.Graph.bfsDistances(ck, seeds, r).count())
      }
    t("bfs rounds=3 (raw edges, raw seeds)") {
      val nodes2 = edges.select(col("a").as("node"))
        .unionAll(edges.select(col("b").as("node"))).distinct()
      println("known=" + graft.operators.Graph.bfsDistances(
        edges, nodes2.where(col("node") % 50 === 0), 3).count())
    }
    s.stop()
  }
}
