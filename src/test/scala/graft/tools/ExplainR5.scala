package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 plan audit: the reworked views/model, multitable LSH, and the
  * mem_search family (regression watch). Prints exchange/window/codegen
  * counts plus the rrfFuse guard's job shape.
  * `sbt "Test/runMain graft.tools.ExplainR5"` */
object ExplainR5 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("mem_search_basic", "mem_search_view_summary",
        "mem_search_view_graph", "mem_search_view_full", "mem_filter_meta",
        "dedup_embedding_multitable", "text_repetition", "mem_search_rrf",
        "dedup_decontaminate", "sample_pack", "search_bm25", "text_shorten")) {
      val plan = graft.SparkEntry.queries(name)(s, d)
        .queryExecution.executedPlan.toString
      def c(p: String) = plan.linesIterator.count(_.contains(p))
      println(s"AUDIT $name exchanges=${c("Exchange")} windows=${c("Window")} " +
        s"codegen=${c("WholeStageCodegen")} topk=${c("TakeOrderedAndProject")} " +
        s"scans=${c("Scan parquet")}")
    }
    s.stop()
  }
}
