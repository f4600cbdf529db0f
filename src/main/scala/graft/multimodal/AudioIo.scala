package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** REAL audio decode through [[Multimodal.Decoder]] — the WAV sibling of
  * [[ImageIo]] (reference analog: fegis embeds every stored document at
  * upsert, storage.py:194-199; an audio corpus featurizes through a
  * decode → window step exactly like this one). The JDK codec is
  * `javax.sound.sampled` (builtin — the same no-env-excuse situation as
  * javax.imageio): bytes flow through `AudioSystem.getAudioInputStream`,
  * a real container/format parser, not a stub.
  *
  * Determinism contract (what lets a pinned-value oracle certify this):
  *  - the WAV container is UNCOMPRESSED 16-bit little-endian PCM, so a
  *    compliant decoder returns the authored samples bit-for-bit (unlike
  *    JPEG's IDCT variants — which is why the image oracle pins PNG and
  *    this one pins WAV, never MP3/OGG);
  *  - synthesis quantizes StrictMath.sin (bit-reproducible across JVMs)
  *    to shorts with a fixed rounding;
  *  - features are integer window sums with one exact int→double
  *    division + a StrictMath.sqrt per window (RMS), and pure integer
  *    counts (zero-crossing rate).
  *
  * Feature layout over `dims`: the first dims/2 values are per-window
  * RMS energies, the second dims/2 are per-window zero-crossing counts —
  * the classic cheap audio signature (energy envelope + spectral-ish
  * brightness proxy). Non-audio payloads fall back to the deterministic
  * [[Multimodal.DigestDecoder]] features — quarantine, not abort,
  * mirroring the image path.
  */
object AudioIo {

  /** Deterministic synthetic clip: a two-tone sine mixture whose
    * frequencies and amplitudes derive from `id`, quantized to 16-bit.
    * `perturb > 0` overwrites the first `perturb` samples with full-scale
    * clicks — the "small edit" whose windowed features must stay CLOSE
    * except in the touched window (the property a whole-payload digest
    * feature cannot have).
    */
  def syntheticPcm(id: Long, samples: Int, perturb: Int = 0): Array[Short] = {
    require(samples >= 1 && perturb >= 0)
    val i = (id % 1000003L).toInt
    val f1 = 2.0 * StrictMath.PI * (220 + 37 * (i % 8)) / 8000.0
    val f2 = 2.0 * StrictMath.PI * (550 + 91 * (i % 5)) / 8000.0
    // id-keyed amplitude envelope (slow sine, 2-4 cycles per clip with
    // an id phase): steady tones have FLAT per-window RMS profiles —
    // every clip's envelope vector would be near-constant and cosine
    // similarity couldn't discriminate clips; the modulation gives each
    // clip a distinctive energy CONTOUR, which is what envelope
    // features are for
    val fe = 2.0 * StrictMath.PI * (2 + i % 3) / samples
    val pe = 2.0 * StrictMath.PI * (i % 7) / 7.0
    val out = new Array[Short](samples)
    var t = 0
    while (t < samples) {
      val env = 0.55 + 0.45 * StrictMath.sin(fe * t + pe)
      val v = env * (0.6 * StrictMath.sin(f1 * t) + 0.3 * StrictMath.sin(f2 * t))
      out(t) = StrictMath.rint(v * 16384.0).toShort
      t += 1
    }
    var p = 0
    while (p < math.min(perturb, samples)) {
      out(p) = if (p % 2 == 0) 16384 else -16384
      p += 1
    }
    out
  }

  /** Minimal RIFF/WAVE container around 16-bit little-endian mono PCM —
    * hand-rolled so the bytes are deterministic to the last header field
    * (no encoder-dependent chunk layout). */
  def wavBytes(pcm: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(bb.putShort)
    bb.array()
  }

  /** REAL decode: the JDK's WAV parser → 16-bit little-endian samples.
    * Returns null for payloads the codec rejects (unsupported/corrupt
    * bytes only — OOM and linkage errors propagate, they are not
    * "undecodable payload"). Unlike image decode (see
    * [[ImageIo.readBounded]]'s decompression-bomb guard), a forged WAV
    * header cannot inflate memory here: the stream is backed by the
    * in-memory payload and PCM is stored 1:1, so `readAllBytes` is
    * bounded by the payload length regardless of what the header
    * declares. */
  def decodeWav(bytes: Array[Byte]): Array[Short] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) null
        else {
          val raw = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val out = new Array[Short](raw.length / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort(); i += 1 }
          out
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
      case _: java.io.IOException => null
      case scala.util.control.NonFatal(_) => null
    }

  /** Windowed features: `windows` equal spans (floor boundaries — every
    * sample lands in exactly one window), per window the RMS energy
    * (integer sum of squares, one exact division, StrictMath.sqrt) and
    * the zero-crossing count (strict sign products < 0). */
  def windowFeatures(pcm: Array[Short], windows: Int): Seq[Double] = {
    require(windows >= 1 && pcm.length >= windows,
      s"clip of ${pcm.length} samples cannot fill $windows windows")
    val rms = new Array[Double](windows)
    val zcr = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      val s0 = (w.toLong * pcm.length / windows).toInt
      val s1 = ((w + 1).toLong * pcm.length / windows).toInt
      var sq = 0L
      var zc = 0
      var t = s0
      while (t < s1) {
        val x = pcm(t).toLong
        sq += x * x
        if (t > s0 && pcm(t - 1).toInt * pcm(t).toInt < 0) zc += 1
        t += 1
      }
      rms(w) = StrictMath.sqrt(sq.toDouble / (s1 - s0))
      zcr(w) = zc.toDouble
      w += 1
    }
    (rms ++ zcr).toSeq
  }

  /** The real-decode audio [[Multimodal.Decoder]]: WAV parse →
    * dims/2-window RMS + zero-crossing features. Payloads the codec
    * rejects (or too short for the window count) fall back to
    * [[Multimodal.DigestDecoder]].
    */
  final class WavDecoder extends Multimodal.Decoder {
    override def decodeBatch(batch: Seq[Multimodal.MediaRow],
        dims: Int): Seq[Multimodal.DecodedRow] = {
      require(dims >= 2 && dims % 2 == 0, s"dims must be even, got $dims")
      val windows = dims / 2
      batch.map { m =>
        val pcm = decodeWav(m.bytes)
        if (pcm == null || pcm.length < windows)
          Multimodal.DigestDecoder.decodeBatch(Seq(m), dims).head
        else
          Multimodal.DecodedRow(m.mediaId, m.kind, m.bytes.length,
            graft.functions.HashFunctions.md5HexJvm(m.bytes),
            windowFeatures(pcm, windows))
      }
    }
  }
}
