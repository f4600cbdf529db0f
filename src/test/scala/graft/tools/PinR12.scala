package graft.tools

import graft.multimodal.{ImageIo, Multimodal, VideoIo}

/** Round-12 pin generator: computes the per-frame DCT features of the
  * demuxed video clips locally (no Spark) so the
  * `multimodal_video_demux_frames` oracle can pin them as shared
  * constants — the engine recomputes the same values through the
  * distributed demux → decode pipeline on every run. The clip corpus
  * comes from the SAME `SparkEntry.videoClipAvis` fixture the gates
  * author, so the pins cannot drift onto a different corpus.
  */
object PinR12 {
  def main(args: Array[String]): Unit = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dec = new ImageIo.ImageIoDecoder()
    graft.SparkEntry.videoClipAvis.foreach { case (clip, avi) =>
      VideoIo.demuxFrames(avi).zipWithIndex.foreach { case (f, i) =>
        val d = dec.decodeBatch(
          Seq(Multimodal.MediaRow(clip * 5 + i, "image", f)), dims = 64).head
        println(s"PIN ($clip, $i, ${r6(d.features.head)}, " +
          s"${r6(d.features(1))}, ${r6(d.features(8))}),")
      }
    }
  }
}
