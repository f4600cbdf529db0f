package graft.tools

import graft.functions.Embedder
import graft.model.MemoryModel
import graft.sink.{InMemoryVectorIndex, VectorIndexSink}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive: index sf0.001 memories into the in-memory vector index.
  * `sbt "Test/runMain graft.tools.DriveSink"` */
object DriveSink {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val mem = MemoryModel.fromEvents(Tables.events(s, "/root/testdata/sf0.001"))
      .withColumn("embedding", Embedder.embed(col("content"), 16).cast("array<float>"))
      .select("memory_id", "session_id", "tool", "sequence_order", "embedding")
    InMemoryVectorIndex.reset()
    VectorIndexSink.ensureCollection(InMemoryVectorIndex.client(), "memories", 16)
    VectorIndexSink.indexBatch(mem, "memories", () => InMemoryVectorIndex.client(), batchSize = 128)
    println("INDEXED=" + InMemoryVectorIndex.pointCount("memories"))
    println("SAMPLE=" + InMemoryVectorIndex.point("memories", "42"))
    s.stop()
  }
}
