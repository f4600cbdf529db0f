package graft.tools

import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Manual end-to-end drive of the streaming ingest surface:
  * `sbt "Test/runMain graft.tools.DriveStreaming"`. */
object DriveStreaming {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val in = Files.createTempDirectory("drive-in").toString
    val store = Files.createTempDirectory("drive-store").toString + "/mem"
    val ckpt = Files.createTempDirectory("drive-ckpt").toString
    Files.writeString(Paths.get(in, "a.jsonl"),
      "{\"memory_id\":\"a\",\"session_id\":\"s\",\"tool\":\"t1\",\"timestamp\":\"2024-01-01T00:00:01Z\",\"value\":1}\n")
    val q = StreamingIngest.startJsonlIngest(s, in, store, ckpt)
    q.processAllAvailable()
    Files.writeString(Paths.get(in, "b.jsonl"),
      "{\"memory_id\":\"b\",\"session_id\":\"s\",\"tool\":\"t2\",\"timestamp\":\"2024-01-01T00:00:05Z\",\"value\":2}\n")
    q.processAllAvailable()
    q.stop()
    println("STORE_ROWS=")
    s.read.parquet(store).orderBy("sequence_order")
      .select("memory_id", "sequence_order", "preceding_memory_id").show()
    s.stop()
  }
}
