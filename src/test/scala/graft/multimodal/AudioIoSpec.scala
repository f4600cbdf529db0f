package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-decode coverage for the WAV path: the samples that come OUT of
  * javax.sound.sampled are the samples that went in (uncompressed PCM
  * roundtrip), the decoder's features equal the hand-computed windowed
  * pipeline, undecodable payloads fall back to the digest stub, and the
  * windowed features have the perceptual property the whole-payload
  * digest cannot: a local edit moves only the touched window. */
class AudioIoSpec extends SparkSpec {

  test("WAV encode/decode roundtrip is sample-exact through the JDK codec") {
    val pcm = AudioIo.syntheticPcm(3L, samples = 4000)
    val back = AudioIo.decodeWav(AudioIo.wavBytes(pcm))
    assert(back != null && back.length == 4000)
    assert(back.sameElements(pcm), "PCM samples changed through WAV roundtrip")
  }

  test("windowFeatures: exact integer RMS/ZCR on a hand-checkable signal") {
    // square-ish wave: +100 +100 -100 -100 repeated -> RMS 100 exactly,
    // one sign change per half-period
    val pcm = Array.tabulate(400)(t =>
      (if ((t / 2) % 2 == 0) 100 else -100).toShort)
    val f = AudioIo.windowFeatures(pcm, windows = 4)
    assert(f.take(4).forall(_ == 100.0))
    // per 100-sample window: sign flips every 2 samples -> 49 or 50
    // crossings depending on phase at the window edge
    assert(f.drop(4).forall(z => z == 49.0 || z == 50.0), f.drop(4).toString)
  }

  test("decoder features equal the hand-computed pipeline; fallback for non-audio") {
    val pcm = AudioIo.syntheticPcm(1L, samples = 2000)
    val wav = AudioIo.wavBytes(pcm)
    val dec = new AudioIo.WavDecoder()
    val rows = dec.decodeBatch(Seq(
      Multimodal.MediaRow(7L, "audio", wav),
      Multimodal.MediaRow(8L, "video", Array[Byte](1, 2, 3, 4, 5))), dims = 64)
    assert(rows.head.features == AudioIo.windowFeatures(pcm, 32))
    val fb = Multimodal.DigestDecoder.decodeBatch(
      Seq(Multimodal.MediaRow(8L, "video", Array[Byte](1, 2, 3, 4, 5))), 64).head
    assert(rows(1).features == fb.features && rows(1).digest == fb.digest)
  }

  test("local edit moves only the touched window; different clips differ broadly") {
    def feats(id: Long, perturb: Int) = AudioIo.windowFeatures(
      AudioIo.syntheticPcm(id, samples = 3200, perturb = perturb), 32)
    val base = feats(2L, 0)
    val edited = feats(2L, 50) // clicks inside window 0 only (100 samples/window)
    val rmsDiff = (0 until 32).count(w => base(w) != edited(w))
    assert(rmsDiff == 1 && base(0) != edited(0),
      s"a 50-sample click must move exactly window 0's RMS, moved $rmsDiff")
    val other = feats(4L, 0)
    val farDiff = (0 until 32).count(w => base(w) != other(w))
    assert(farDiff >= 24, s"different clips differ in only $farDiff/32 windows")
  }

  test("extractFeatures plumbing carries the WAV decoder end-to-end") {
    import spark.implicits._
    val media = spark.range(0, 4).as[Long].map { id =>
      (id, "audio", AudioIo.wavBytes(AudioIo.syntheticPcm(id, samples = 1600)))
    }.toDF("media_id", "kind", "bytes")
    val f = Multimodal.extractFeatures(media, dims = 64, batchSize = 3,
      decoder = new AudioIo.WavDecoder())
    assert(f.count() == 4)
    val r = f.where(col("media_id") === 1).head()
    val expected = AudioIo.windowFeatures(AudioIo.syntheticPcm(1L, 1600), 32)
    assert(r.getAs[scala.collection.Seq[Double]]("features").toSeq == expected)
  }
}
