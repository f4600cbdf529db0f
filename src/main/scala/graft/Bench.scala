package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Queries materialize through the noop sink — unlike count(), noop
  * evaluates every projected expression (embeddings, hashes, previews)
  * and keeps sorts, so timings reflect real work. A flagship warm-up run
  * pays JIT/codegen compilation once, outside the measured loop.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JIT/codegen warm-up at the smallest SF (not measured)
    try {
      materialize(SparkEntry.entry(spark))
      SparkEntry.queries.take(4).foreach { case (_, fn) =>
        try materialize(fn(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
