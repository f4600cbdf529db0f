package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale soak: run candidate-generating gates at two scale points and
  * report (rows, seconds) so SCALE_NOTES can show measured growth:
  * `Test/runMain graft.tools.ScaleSoak <dir> <gate> [gate…]`.
  *
  * For the pair/candidate gates the OUTPUT relation *is* the candidate
  * set (post banding/cap/blocking), so its row count against a 10×
  * input is exactly the sub-quadratic claim under test. Count executes
  * the full plan (joins and aggregations can't be pruned below a
  * count); each gate runs twice and reports the warm pass.
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSoak <sfDir> <gate…>")
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // probe_embedding_sized: the gate's fixed planes=4 is the sf-scale
    // deterministic choice; the documented scale rule is planesFor —
    // this probe applies it (target bucket 128) so the soak measures
    // the rule, not the gate constant.
    def run(name: String): org.apache.spark.sql.DataFrame = name match {
      case "probe_embedding_sized" =>
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val planes = graft.operators.Dedup.planesFor(e.count(),
          targetBucketSize = 128)
        println(s"PROBE probe_embedding_sized planes=$planes dir=$dir")
        graft.operators.Dedup.embeddingNearDupPairs(e, "embedding",
          "vec_id", minCosine = 0.2, planes = planes, seed = 7, dims = 64)
      case n => graft.SparkEntry.queries(n)(spark, dir)
    }
    for (name <- args.drop(1)) {
      try {
        var rows = 0L
        var best = Double.MaxValue
        for (_ <- 1 to 2) {
          val t0 = System.nanoTime()
          rows = run(name).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"SOAK $name rows=$rows sec=$best%.2f dir=$dir")
      } catch {
        case e: Throwable =>
          println(s"SOAK $name ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)} dir=$dir")
      }
    }
    spark.stop()
  }
}
