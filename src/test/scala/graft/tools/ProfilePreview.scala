package graft.tools

import graft.functions.TextFunctions
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfilePreview {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(s, "/root/testdata/sf0.1").persist()
    docs.count()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"PREV $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("norm_only")(docs.select(
      TextFunctions.normalizeWhitespace(col("text")).as("n")))
    time("extract_all")(docs.select(
      regexp_extract_all(TextFunctions.normalizeWhitespace(col("text")),
        lit("[^.!?]+[.!?]+"), lit(0)).as("sen")))
    time("plus_trim")(docs.select(
      transform(regexp_extract_all(TextFunctions.normalizeWhitespace(col("text")),
        lit("[^.!?]+[.!?]+"), lit(0)), x => trim(x)).as("sen")))
    time("full")(TextFunctions.withContentPreview(docs, "text", "preview")
      .select("doc_id", "preview"))
    s.stop()
  }
}
// appended: repartition variant
object ProfilePreviewPar {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(s, "/root/testdata/sf0.1")
      .repartition(32)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      TextFunctions.withContentPreview(docs, "text", "preview")
        .select("doc_id", "preview")
        .write.format("noop").mode("overwrite").save()
      println(f"PAR full#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
