package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-5 second wave (SQ8, temperature sampling,
  * anomaly z-scores, canonical dedup map, corpus filter, vocabulary,
  * centroid ops — stream_dedup is excluded: building its plan runs the
  * staged stream): exchange/window/codegen/top-k/scan counts per gate,
  * plus targeted assertions on the shapes that matter at 100 TB — the
  * SQ8 and vocabulary top-ks must be TakeOrderedAndProject (no global
  * sort) and SQ8 must add no exchange beyond the bench inputs' spread
  * repartition; the anomaly query must roll up raw events exactly once.
  * `sbt "Test/runMain graft.tools.ExplainR5b"` */
object ExplainR5b {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def plan(name: String): String =
      graft.SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString
    def c(p: String, pat: String) = p.linesIterator.count(_.contains(pat))
    for (name <- Seq("search_sq8", "sample_temperature", "events_anomaly",
        "dedup_canonical", "text_corpus_filter", "text_vocabulary",
        "search_label_centroids", "search_centroid_assign")) {
      val p = plan(name)
      println(s"AUDIT $name exchanges=${c(p, "Exchange")} windows=${c(p, "Window")} " +
        s"codegen=${c(p, "WholeStageCodegen")} topk=${c(p, "TakeOrderedAndProject")} " +
        s"scans=${c(p, "Scan parquet")}")
    }
    val sq8 = plan("search_sq8")
    assert(c(sq8, "TakeOrderedAndProject") == 1, "sq8: top-k must be TakeOrdered")
    assert(c(sq8, "Exchange") <= 1, // only the bench inputs' spread repartition
      "sq8: search itself must add no shuffle")
    val vocab = plan("text_vocabulary")
    assert(c(vocab, "TakeOrderedAndProject") == 1, "vocab: top-k must be TakeOrdered")
    val anomaly = plan("events_anomaly")
    assert(c(anomaly, "Scan parquet") == 1, "anomaly: exactly one raw-events scan")
    println("ASSERTIONS OK")
    s.stop()
  }
}
