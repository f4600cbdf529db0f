package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-5 second wave (SQ8, temperature sampling,
  * anomaly z-scores, canonical dedup map, corpus filter, vocabulary,
  * centroid ops): exchange/window/codegen/top-k/scan counts per gate,
  * plus targeted assertions on the shapes that matter at 100 TB —
  * SQ8 search must stay shuffle-free with one top-k, the anomaly query
  * must roll up raw events exactly once, and the vocabulary top-k must
  * be TakeOrderedAndProject (no global sort).
  * `sbt "Test/runMain graft.tools.ExplainR5b"` */
object ExplainR5b {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String =
      graft.SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString
    def c(p: String, pat: String) = p.linesIterator.count(_.contains(pat))
    for (name <- Seq("search_sq8", "sample_temperature", "events_anomaly",
        "dedup_canonical", "text_corpus_filter", "text_vocabulary",
        "search_label_centroids", "search_centroid_assign", "stream_dedup")
        if name != "stream_dedup") { // stream gate runs a query, skip in audit
      val p = plan(name)
      println(s"AUDIT $name exchanges=${c(p, "Exchange")} windows=${c(p, "Window")} " +
        s"codegen=${c(p, "WholeStageCodegen")} topk=${c(p, "TakeOrderedAndProject")} " +
        s"scans=${c(p, "Scan parquet")}")
    }
    val sq8 = plan("search_sq8")
    assert(c(sq8, "TakeOrderedAndProject") == 1, "sq8: top-k must be TakeOrdered")
    val vocab = plan("text_vocabulary")
    assert(c(vocab, "TakeOrderedAndProject") == 1, "vocab: top-k must be TakeOrdered")
    val anomaly = plan("events_anomaly")
    assert(c(anomaly, "Scan parquet") == 1, "anomaly: exactly one raw-events scan")
    println("ASSERTIONS OK")
    s.stop()
  }
}
