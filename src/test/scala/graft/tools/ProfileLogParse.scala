package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of log_parse_roundtrip to find the hot step. */
object ProfileLogParse {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def lines: DataFrame = graft.Tables.events(s, d).select(concat(
      lit("Message from client: {\"id\": "), col("event_id"),
      lit(", \"tool\": \""), col("event_type"), lit("\"}")).as("line"))

    def time(name: String)(df: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"PROF $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("scan_concat")(lines)
    time("plus_regex")(lines.withColumn("payload",
      regexp_extract(col("line"), "Message from (client|server): (.*)", 2)))
    def parsedFrom = lines.withColumn("payload",
        regexp_extract(col("line"), "Message from (client|server): (.*)", 2))
      .withColumn("j", from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL("id LONG, tool STRING")))
      .select(col("j.id").as("id"), col("j.tool").as("tool"))
    def parsedGet = lines.withColumn("payload",
        regexp_extract(col("line"), "Message from (client|server): (.*)", 2))
      .select(
        get_json_object(col("payload"), "$.id").cast("long").as("id"),
        get_json_object(col("payload"), "$.tool").as("tool"))
    time("from_json")(parsedFrom)
    time("get_json_object")(parsedGet)
    time("from_json_sorted")(parsedFrom.orderBy(col("id")))
    time("get_json_sorted")(parsedGet.orderBy(col("id")))
    s.stop()
  }
}
