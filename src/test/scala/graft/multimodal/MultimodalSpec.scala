package graft.multimodal

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta"), (1L, "gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta"), (5L, "theta iota"))
      .toDF("doc_id", "text")
  }

  test("fromDocuments: binary payload + typed metadata, kind cycles by id") {
    val m = Multimodal.fromDocuments(docs)
    val kinds = m.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video",
      3L -> "image", 5L -> "video"))
    val row = m.where(col("media_id") === 2).head()
    assert(new String(row.getAs[Array[Byte]]("bytes"), "UTF-8") == "delta epsilon zeta")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Long]("duration_ms") == 3000L)
  }

  test("extractFeatures: deterministic stub features, correct batch plumbing") {
    val m = Multimodal.fromDocuments(docs)
    // batchSize 2 forces multiple batches per partition
    val f = Multimodal.extractFeatures(m, dims = 4, batchSize = 2)
    assert(f.count() == 5)
    val r = f.where(col("media_id") === 0).head()
    val digest = HashFunctions.md5HexJvm("alpha beta".getBytes("UTF-8"))
    assert(r.getAs[String]("digest") == digest)
    assert(r.getAs[Int]("byte_len") == 10)
    val expected = (0 until 4).map(d =>
      ((HashFunctions.hash64Jvm(s"$digest#$d") % 2001) - 1000) / 1000.0)
    assert(r.getSeq[Double](r.fieldIndex("features")) == expected)
  }

  test("resizeStub updates geometry metadata and format, keeps bytes") {
    val m = Multimodal.resizeStub(Multimodal.fromDocuments(docs), 64, 64)
    val row = m.where(col("media_id") === 1).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 64 && meta.getAs[Int]("height") == 64)
    assert(meta.getAs[String]("format") == "audio/resized64x64")
    assert(new String(row.getAs[Array[Byte]]("bytes"), "UTF-8") == "gamma")
  }

  test("sampleFrames explodes video rows at the sampling step") {
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), stepMs = 400)
    // media 2: duration 3000ms -> ts 0,400,...,2800 = 8 frames
    val m2 = frames.where(col("media_id") === 2)
    assert(m2.count() == 8)
    assert(m2.agg(max("frame_ts_ms")).head().getLong(0) == 2800L)
    // only video kind explodes
    assert(frames.select("media_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(2L, 5L))
  }
}
