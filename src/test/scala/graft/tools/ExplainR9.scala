package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-9 operators (the ExplainAudit pattern):
  * partial-aggregation shape for the bounded-buffer sketch Aggregators,
  * broadcast sides, codegen spans. `Test/runMain graft.tools.ExplainR9`.
  */
object ExplainR9 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("profile_kmv_audit", "profile_kmv_intersect",
        "profile_mg_audit", "profile_calibration", "events_survival_km",
        "events_survival_logrank", "events_survival_bands",
        "mine_seq_pairs", "search_sparse_budget", "mine_frequent_pairs_rel")) {
      val plan = graft.SparkEntry.queries(name)(s, d)
        .queryExecution.executedPlan.toString
      val part = plan.linesIterator.count(l =>
        l.contains("ObjectHashAggregate") && l.contains("partial"))
      val sort = plan.linesIterator.count(_.contains("SortAggregate"))
      val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      val exch = plan.linesIterator.count(_.contains("Exchange"))
      println(s"AUDIT $name partialObjAgg=$part sortAgg=$sort " +
        s"broadcast=$bhj sortMerge=$smj codegenSpans=$wsc exchanges=$exch")
    }
    s.stop()
  }
}
