package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: graph gates whose frequent-pairs edge derivation is
  * re-evaluated by both branches of the undirected union (lazy lineage)
  * vs a checkpoint-once variant (the graph_bfs_distances discipline).
  * One JVM, min-of-N per arm. `Test/runMain graft.tools.AbGraphCkpt <rounds>`.
  */
object AbGraphCkpt {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def edgesLazy: DataFrame =
      graft.operators.MarketBasket.frequentPairs(
        graft.Tables.lineitem(s, d), "l_orderkey", "l_partkey",
        minSupport = 2).select(col("a"), col("b"))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("graph_pagerank",
        () => graft.operators.Graph.pageRank(edgesLazy, rounds = 3),
        () => graft.operators.Graph.pageRank(edgesLazy.localCheckpoint(),
          rounds = 3)),
      ("graph_label_communities",
        () => graft.operators.Graph.labelCommunities(edgesLazy, rounds = 3),
        () => graft.operators.Graph.labelCommunities(
          edgesLazy.localCheckpoint(), rounds = 3)),
      ("graph_ktruss",
        () => graft.operators.Graph.kTrussPeel(edgesLazy, k = 3, rounds = 3),
        () => graft.operators.Graph.kTrussPeel(edgesLazy.localCheckpoint(),
          k = 3, rounds = 3)),
      ("graph_assortativity",
        () => graft.operators.Graph.assortativity(edgesLazy),
        () => graft.operators.Graph.assortativity(edgesLazy.localCheckpoint())),
      ("graph_wedge_census",
        () => graft.operators.Graph.wedgeCensus(edgesLazy, hubMax = 8L),
        () => graft.operators.Graph.wedgeCensus(edgesLazy.localCheckpoint(),
          hubMax = 8L)))

    variants.foreach { case (_, a, b) => time(a()); time(b()) } // warm
    variants.foreach { case (name, a, b) =>
      var mA = Double.MaxValue; var mB = Double.MaxValue
      (1 to rounds).foreach { _ =>
        mA = math.min(mA, time(a()))
        mB = math.min(mB, time(b()))
      }
      println(f"AB $name%-26s lazy=$mA%6.2f  ckpt=$mB%6.2f  ratio=${mB / mA}%.2f")
    }
    s.stop()
  }
}
