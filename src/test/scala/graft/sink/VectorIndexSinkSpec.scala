package graft.sink

import graft.SparkSpec
import graft.functions.Embedder
import org.apache.spark.sql.functions._

class VectorIndexSinkSpec extends SparkSpec {
  import VectorIndexSink._

  private def memoriesDf = {
    import spark.implicits._
    Seq(
      ("m1", "s1", "click", 1),
      ("m2", "s1", "view", 2),
      ("m3", "s2", "click", 1))
      .toDF("memory_id", "session_id", "tool", "sequence_order")
      .withColumn("embedding",
        Embedder.embed(col("memory_id"), 8).cast("array<float>"))
  }

  test("ensureCollection is idempotent and diffs payload indexes") {
    InMemoryVectorIndex.reset()
    val c = InMemoryVectorIndex.client()
    ensureCollection(c, "memories", 8)
    assert(InMemoryVectorIndex.createCollectionCalls.get() == 1)
    assert(InMemoryVectorIndex.createIndexCalls.get() == PayloadIndexes.size)
    // second bootstrap: nothing new to create (O2 index diffing)
    ensureCollection(c, "memories", 8)
    assert(InMemoryVectorIndex.createCollectionCalls.get() == 1)
    assert(InMemoryVectorIndex.createIndexCalls.get() == PayloadIndexes.size)
  }

  test("indexBatch upserts every row with payload, idempotent on ids") {
    InMemoryVectorIndex.reset()
    ensureCollection(InMemoryVectorIndex.client(), "memories", 8)
    indexBatch(memoriesDf, "memories", () => InMemoryVectorIndex.client())
    assert(InMemoryVectorIndex.pointCount("memories") == 3)
    val p = InMemoryVectorIndex.point("memories", "m2").get
    assert(p.payload("session_id") == "s1")
    assert(p.payload("tool") == "view")
    assert(p.payload("sequence_order") == "2")
    assert(p.vector.length == 8)
    // replay the same batch (task retry): same ids, same count
    indexBatch(memoriesDf, "memories", () => InMemoryVectorIndex.client())
    assert(InMemoryVectorIndex.pointCount("memories") == 3)
  }

  test("upserts flow in bounded batches") {
    InMemoryVectorIndex.reset()
    import spark.implicits._
    val big = (1 to 100).map(i => (s"m$i", s"s${i % 5}"))
      .toDF("memory_id", "session_id")
      .withColumn("embedding",
        Embedder.embed(col("memory_id"), 4).cast("array<float>"))
      .repartition(2)
    indexBatch(big, "c2", () => InMemoryVectorIndex.client(), batchSize = 16)
    assert(InMemoryVectorIndex.pointCount("c2") == 100)
    import scala.jdk.CollectionConverters._
    val sizes = InMemoryVectorIndex.batchSizes.asScala.toSeq
    assert(sizes.forall(_ <= 16))
    assert(sizes.sum == 100)
  }

  test("continuous indexing: stream -> batched embed seam -> upsert, replays idempotent") {
    // the reference's operational write path (per-call embed + Qdrant
    // upsert, storage.py:194-199) as a real stream: each micro-batch
    // embeds through the TextEmbedder seam and foreachBatch-upserts into
    // the vector index; at-least-once delivery (a replayed batch) must
    // land on the same ids
    import graft.functions.TextEmbedder
    import org.apache.spark.sql.types.{StructField, StructType, StringType}
    InMemoryVectorIndex.reset()
    ensureCollection(InMemoryVectorIndex.client(), "cstream", 8)
    val work = "/tmp/graft_spec_index_stream"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    import spark.implicits._
    def stage(rows: Seq[(String, String)]): Unit = rows.toDF("memory_id", "content")
      .select(to_json(struct(col("memory_id"), col("content"))).as("value"))
      .coalesce(1).write.mode("append").text(s"$work/in")
    stage(Seq("m1" -> "alpha beta", "m2" -> "gamma delta"))
    val parsed = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(s"$work/in")
      .select(from_json(col("value"), StructType(Seq(
        StructField("memory_id", StringType),
        StructField("content", StringType)))).as("j"))
      .select(col("j.*"))
    val q = parsed.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val emb = TextEmbedder.embedText(b, "content", "embedding", dims = 8)
          .withColumn("embedding", col("embedding").cast("array<float>"))
        indexBatch(emb, "cstream", () => InMemoryVectorIndex.client())
      }
      .start()
    try {
      q.processAllAvailable()
      // batch 2 includes a REPLAY of m1 (at-least-once delivery)
      stage(Seq("m3" -> "epsilon zeta", "m1" -> "alpha beta"))
      q.processAllAvailable()
    } finally q.stop()
    assert(InMemoryVectorIndex.pointCount("cstream") == 3)
    // the streamed vector is the seam's surrogate, bit-exact
    val expected = graft.functions.SurrogateTextEmbedder
      .embedOne("alpha beta", 8).map(_.toFloat).toSeq
    assert(InMemoryVectorIndex.point("cstream", "m1").get.vector == expected)
  }
}
