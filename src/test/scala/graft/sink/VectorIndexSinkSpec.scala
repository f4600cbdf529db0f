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
}
