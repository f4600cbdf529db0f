package graft.tools

import org.apache.spark.sql.SparkSession

object TimeOne {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, d)
        .write.format("noop").mode("overwrite").save()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
