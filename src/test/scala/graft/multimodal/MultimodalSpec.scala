package graft.multimodal

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** Instrumented decoder: static counters survive closure serialization in
  * local mode (tasks share this JVM), recording per-partition setups and
  * the size of every batch the operator hands over.
  */
object FakeDecoder extends Multimodal.Decoder {
  val setups = new java.util.concurrent.atomic.AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def reset(): Unit = { setups.set(0); batchSizes.clear() }
  override def setup(): Unit = { setups.incrementAndGet(); () }
  override def decodeBatch(batch: Seq[Multimodal.MediaRow], dims: Int): Seq[Multimodal.DecodedRow] = {
    batchSizes.add(batch.size)
    batch.map(m => Multimodal.DecodedRow(m.mediaId, m.kind, m.bytes.length,
      "fake", (1 to dims).map(_.toDouble)))
  }
}

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

  test("a custom Decoder drops into extractFeatures: per-partition setup, bounded batches") {
    val m = Multimodal.fromDocuments(docs).coalesce(2)
    FakeDecoder.reset()
    val f = Multimodal.extractFeatures(m, dims = 3, batchSize = 2,
      decoder = FakeDecoder)
    val rows = f.collect()
    assert(rows.length == 5)
    // the fake's output (not the digest stub's) comes through the operator
    assert(rows.forall(_.getAs[String]("digest") == "fake"))
    assert(rows.forall(r =>
      r.getSeq[Double](r.fieldIndex("features")) == Seq(1.0, 2.0, 3.0)))
    // setup ran once per non-empty partition, batches never exceeded batchSize
    val setups = FakeDecoder.setups.get()
    assert(setups >= 1 && setups <= 2, s"setup calls: $setups")
    import scala.jdk.CollectionConverters._
    val sizes = FakeDecoder.batchSizes.asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 2), s"batches: $sizes")
    assert(sizes.sum == 5)
  }

  test("PerceptualDecoder: small edits keep high cosine, digest features don't") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val edited = base.replace("lazy", "hazy") // 1-word edit in ~350 bytes
    val other = "completely different payload with no shared shingles xyzzy " * 6
    val m = Seq((0L, base), (1L, edited), (2L, other)).toDF("doc_id", "text")
    def cos(decoder: Multimodal.Decoder): Map[(Long, Long), Double] = {
      val f = Multimodal.extractFeatures(
        Multimodal.fromDocuments(m), dims = 64, decoder = decoder)
      val l = f.select(col("media_id").as("a"), col("features").as("va"))
      val r = f.select(col("media_id").as("b"), col("features").as("vb"))
      l.join(r, col("a") < col("b"))
        .select(col("a"), col("b"),
          graft.functions.VectorFunctions.cosine(col("va"), col("vb"), 64).as("c"))
        .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    }
    val p = cos(Multimodal.PerceptualDecoder)
    // near-dup pair is geometrically close; the unrelated doc is not
    assert(p((0L, 1L)) > 0.9, s"perceptual near-dup cosine: ${p((0L, 1L))}")
    assert(p((0L, 2L)) < 0.5 && p((1L, 2L)) < 0.5, s"unrelated: $p")
    // the whole-payload digest stub has no such geometry: one edit
    // decorrelates completely (this is WHY near-dup needs the perceptual
    // feature, not the digest feature)
    val g = cos(Multimodal.DigestDecoder)
    assert(g((0L, 1L)) < 0.5, s"digest features should decorrelate: ${g((0L, 1L))}")
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
