package graft.tools

import graft.multimodal.{AudioIo, Multimodal}

/** Generates the pinned-literal rows for the audio oracle gates (how the
  * pins were made, kept in-repo): encode the 8 gate clips, decode them
  * through the REAL WavDecoder, round to 6, print Scala literal rows and
  * the full pairwise cosine matrix (for threshold selection in the
  * near-dup gate). Pure JVM — no Spark session.
  * `Test/runMain graft.tools.AudioPin`.
  */
object AudioPin {
  def main(args: Array[String]): Unit = {
    val dec = new AudioIo.WavDecoder()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (0L until 8L).map { id =>
      val base = id % 4
      val wav = AudioIo.wavBytes(AudioIo.syntheticPcm(base,
        samples = 1600 + 320 * (base % 3).toInt,
        perturb = if (id >= 4) 60 else 0))
      val f = dec.decodeBatch(Seq(Multimodal.MediaRow(id, "audio", wav)), 64)
        .head.features.map(r6)
      (id, f)
    }
    rows.foreach { case (id, f) =>
      println(s"PIN    ($id, Seq(${f.mkString(", ")})),")
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (StrictMath.sqrt(a.map(x => x * x).sum) *
        StrictMath.sqrt(b.map(x => x * x).sum))
    }
    for (a <- 0 until 8; b <- a + 1 until 8)
      println(f"COS $a-$b ${cos(rows(a)._2, rows(b)._2)}%.6f")
  }
}
