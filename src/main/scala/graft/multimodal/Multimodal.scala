package graft.multimodal

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `BINARY` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample plumbing.
  *
  * REAL codecs plug into the [[Decoder]] seam where the JDK carries
  * them: PNG/JPEG pixels via `javax.imageio` ([[ImageIo.ImageIoDecoder]]),
  * WAV PCM via `javax.sound.sampled` ([[AudioIo.WavDecoder]]), and AVI
  * container demux via the hand-rolled RIFF walk
  * ([[VideoIo.demuxFrames]]). The [[DigestDecoder]] below is the
  * clearly-marked STUB fallback for codecs absent from this environment
  * (e.g. H.264): deterministic fake features from the bytes' md5.
  * Everything around the seam — schema, batch shape, partitioning,
  * explosion — is the real Spark plumbing a production decoder would use
  * unchanged:
  *
  *  - per-row binary + metadata struct travel in the same row as the
  *    analytic columns (parquet stores the blob column contiguously;
  *    column pruning means metadata-only queries never read bytes);
  *  - feature extraction runs through `mapPartitions` with an explicit
  *    micro-batch (`batchSize`) — the shape a vectorized decoder / ONNX
  *    runtime wants (amortized model setup per partition, batched infer);
  *  - frame sampling is a row explosion (`explode(sequence(...))`) —
  *    codegen'd, shuffle-free.
  */
object Multimodal {

  /** Build a media table from the documents testdata: the text bytes stand
    * in for an encoded media payload; metadata is deterministic per doc.
    * kind cycles image/audio/video by doc_id.
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val kind = element_at(
      typedLit(Seq("image", "audio", "video")),
      (col("doc_id") % 3).cast("int") + 1)
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        ((col("doc_id") % 8) * 160 + 320).cast("int").as("width"),
        ((col("doc_id") % 8) * 90 + 180).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        ((col("doc_id") % 10 + 1) * 1000).cast("long").as("duration_ms"),
        kind.as("format")).as("meta"))
  }

  /** One media row flowing into a decoder batch. */
  final case class MediaRow(mediaId: Long, kind: String, bytes: Array[Byte])

  /** One decoded row: payload stats + feature vector. */
  final case class DecodedRow(mediaId: Long, kind: String, byteLen: Int,
      digest: String, features: Seq[Double])

  /** The codec seam: a production decoder (JPEG/WAV codec + feature model,
    * ONNX runtime, …) implements this and drops into [[extractFeatures]]
    * without touching the operator — the same pluggable-backend pattern as
    * VectorIndexSink's client factory. Implementations must be
    * Serializable (shipped to executors inside the mapPartitions closure).
    */
  trait Decoder extends Serializable {
    /** Called once per partition before the first batch — open codecs,
      * load the model. Amortized setup is the reason the operator batches
      * inside mapPartitions instead of using a per-row UDF. */
    def setup(): Unit = ()
    /** Decode + featurize one bounded batch (≤ the operator's batchSize). */
    def decodeBatch(batch: Seq[MediaRow], dims: Int): Seq[DecodedRow]
  }

  /** STUB DECODE (the default): this environment has no media libraries,
    * so features are a deterministic function of the payload digest (same
    * md5-hash64 family as the rest of the engine, so external SQL can
    * verify the plumbing end-to-end). Everything a real decoder needs from
    * the operator — batching, per-partition setup, binary transport — is
    * exercised identically.
    */
  object DigestDecoder extends Decoder {
    override def decodeBatch(batch: Seq[MediaRow], dims: Int): Seq[DecodedRow] =
      batch.map { m =>
        val digest = HashFunctions.md5HexJvm(m.bytes)
        val feats = (0 until dims).map { d =>
          ((HashFunctions.hash64Jvm(s"$digest#$d") % 2001) - 1000) / 1000.0
        }
        DecodedRow(m.mediaId, m.kind, m.bytes.length, digest, feats)
      }
  }

  /** PERCEPTUAL STUB DECODE: the pHash analog through the same seam. A
    * real perceptual hash is a content-derived sketch that is STABLE
    * under small payload edits (DCT of a downscaled grayscale image,
    * chroma fingerprints for audio); with no media codecs in this
    * environment, the content-derived sketch here is a signed
    * byte-shingle hash (SimHash-as-vector): every 4-byte shingle of the
    * payload hashes to (dimension, ±1) and the signed counts accumulate
    * into a `dims`-long vector. Payloads sharing most of their bytes
    * share most shingles → high cosine; unrelated payloads decorrelate.
    * Unlike [[DigestDecoder]] (whole-payload digest → features change
    * completely on a 1-byte edit), this gives the near-duplicate
    * geometry a perceptual feature needs, so the downstream RHP-bucketed
    * near-dup join ([[graft.operators.Dedup.embeddingNearDupPairs]])
    * exercises the exact plan a real pHash column would use.
    *
    * Engine-portable: shingles are hashed via the md5-top-60-bit family
    * over the payload's lowercase hex, so an external SQL oracle
    * reproduces the features bit-for-bit (integer-valued doubles — all
    * sums exact).
    */
  object PerceptualDecoder extends Decoder {
    override def decodeBatch(batch: Seq[MediaRow], dims: Int): Seq[DecodedRow] =
      batch.map { m =>
        val n = m.bytes.length
        val hex = HashFunctions.bytesToHex(m.bytes)
        val acc = new Array[Double](dims)
        var i = 0
        while (i + 4 <= n) {
          val h = HashFunctions.hash64Jvm(hex.substring(2 * i, 2 * i + 8))
          acc((h % dims).toInt) += (if ((h / dims) % 2 == 0) 1 else -1)
          i += 1
        }
        DecodedRow(m.mediaId, m.kind, n, HashFunctions.md5HexJvm(m.bytes),
          acc.toSeq)
      }
  }

  /** Batched feature extraction over the binary column via mapPartitions:
    * per-partition `decoder.setup()`, then rows flow in bounded
    * `batchSize` groups through `decoder.decodeBatch` — the shape a
    * vectorized decoder / inference runtime wants.
    */
  def extractFeatures(media: DataFrame, dims: Int, batchSize: Int = 64,
      decoder: Decoder = DigestDecoder): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        decoder.setup()
        it.grouped(batchSize).flatMap { batch =>
          decoder.decodeBatch(
            batch.map { case (id, kind, bytes) => MediaRow(id, kind, bytes) },
            dims)
            .map(d => (d.mediaId, d.kind, d.byteLen, d.digest, d.features))
        }
      }
      .toDF("media_id", "kind", "byte_len", "digest", "features")
  }

  /** Resize plumbing: bytes pass through (STUB — a real resize re-encodes),
    * metadata is updated to the target geometry, preserving aspect ratio
    * bookkeeping in `meta.format`.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      lit(w).as("width"),
      lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms"),
      concat(col("meta.format"), lit(s"/resized${w}x$h")).as("format")))

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `stepMs` within meta.duration_ms). Pure explosion —
    * no shuffle, no UDF.
    */
  def sampleFrames(media: DataFrame, stepMs: Int): DataFrame =
    media
      .where(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(F.sequence(lit(0L), col("meta.duration_ms"), lit(stepMs.toLong)))
          .as("frame_ts_ms"))
      .withColumn("frame_no", (col("frame_ts_ms") / stepMs).cast("int"))

  /** Frame-pooled video embedding — the video twin of
    * [[graft.operators.Similarity.chunkPooledEmbed]]: sample frames,
    * feature each frame with the deterministic surrogate (integer
    * components keyed on content digest ⊕ frame timestamp ⊕ dim; a real
    * per-frame vision model drops into the same (digest, ts) keying),
    * mean-pool, normalize. Same cancelled-scale algebra: pooled
    * `v_d = Σs_d/√(Σ(Σs_d)²)` over pure integer sums, one sqrt + one
    * division per dim, float components. Output long-form
    * (media_id, n_frames, d, v) — scalar rows, engine-comparable.
    *
    * Shape: frame explosion (in-row) → frame×dims explode → ONE
    * combiner-heavy (media, dim) integer sum; the digest is computed
    * once per media row before the explosion.
    */
  def framePooledEmbed(media: DataFrame, dims: Int, stepMs: Int): DataFrame = {
    require(dims >= 2 && stepMs >= 1)
    val frames = media
      .where(col("kind") === "video")
      .select(col("media_id"), F.md5(col("bytes")).as("digest"),
        explode(F.sequence(lit(0L), col("meta.duration_ms"), lit(stepMs.toLong)))
          .as("ts"))
    val sums = frames
      .select(col("media_id"), col("digest"), col("ts"),
        explode(F.sequence(lit(0), lit(dims - 1))).as("d"))
      .select(col("media_id"), col("d"),
        (graft.functions.HashFunctions.hash64(F.concat_ws("#",
          col("digest"), col("ts").cast("string"), col("d").cast("string")))
          % 2001 - 1000).as("r"))
      .groupBy(col("media_id"), col("d"))
      .agg(F.sum(col("r")).as("s"), F.count(lit(1)).as("n_frames"))
    val ss = sums.groupBy(col("media_id"))
      .agg(F.sum(col("s") * col("s")).as("ss"))
    sums.join(ss, "media_id")
      .where(col("ss") > 0)
      .select(col("media_id"), col("n_frames"), col("d"),
        (col("s").cast("double") / F.sqrt(col("ss").cast("double")))
          .cast("float").cast("double").as("v"))
  }
}
