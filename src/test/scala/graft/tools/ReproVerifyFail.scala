package graft.tools

import org.apache.spark.sql.SparkSession

object ReproVerifyFail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.SparkEntry.queries("dedup_exact")(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet("/tmp/repro_out")
      println("REPRO_OK")
    } catch { case e: Throwable =>
      println("REPRO_FAIL " + e.getClass.getName + ": " + e.getMessage)
      e.printStackTrace()
    }
    spark.stop()
  }
}
