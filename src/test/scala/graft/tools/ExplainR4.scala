package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-4 operators: ADC must be all broadcast joins
  * (never SMJ/BNL), the hot skew join a union of two hash joins, sampling
  * a pure pushdown filter, repetition two combiner aggregations, and the
  * layout read a partition-pruned scan.
  */
object ExplainR4 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("search_pq_adc", "q_skew_join_hot", "text_repetition",
        "sample_split", "sample_mixture", "dedup_incremental",
        "text_redact_pii", "mem_search_view_graph")) {
      val df = graft.SparkEntry.queries(name)(s, d)
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = plan.linesIterator.count(_.contains(p))
      println(s"AUDIT $name bnl=${n("BroadcastNestedLoop")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"agg=${n("HashAggregate")} exchange=${n("Exchange")} " +
        s"top=${n("TakeOrderedAndProject")} wsc=${n("WholeStageCodegen")} " +
        s"pushed=${n("PushedFilters: [I")}")
    }
    s.stop()
  }
}
