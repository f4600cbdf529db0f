package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-3 operators: the range join must plan as a
  * hash join on the bucket key (never BroadcastNestedLoop), the as-of
  * join as a single window pass (no join nodes), pruned RRF as
  * TakeOrderedAndProject + BroadcastHashJoin.
  */
object ExplainNewOps {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q_asof_join", "q_range_join", "q_skew_join_salted",
        "mem_search_rrf_pruned", "q_grouping_sets", "search_ivf_kmeans")) {
      val plan = graft.SparkEntry.queries(name)(s, d)
        .queryExecution.executedPlan.toString
      def n(p: String) = plan.linesIterator.count(_.contains(p))
      println(s"AUDIT $name bnl=${n("BroadcastNestedLoop")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"window=${n("Window")} top=${n("TakeOrderedAndProject")} " +
        s"expand=${n("Expand")} exchange=${n("Exchange")}")
    }
    s.stop()
  }
}
