package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: the distributed substring-span dedup agrees with a naive
  * in-memory reference — duplicated window marking and maximal interval
  * merge — over arbitrary small-vocab corpora (repeats, cross-doc runs,
  * sub-k docs, empty docs). */
class SubstringPropertySpec extends SparkSpec {

  private val K = 3

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 14)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield toks.mkString(" ")

  /** Naive reference: count every k-window (with multiplicity, corpus
    * wide), mark positions whose window count ≥ 2, merge windows that
    * overlap or touch (gap ≤ k) into maximal spans. */
  private def naive(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long)]] = {
    val windows = docs.flatMap { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      toks.sliding(K).filter(_.length == K).zipWithIndex
        .map { case (w, i) => (id, i.toLong + 1, w.mkString(" ")) }.toSeq
    }
    val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = windows.filter(w => counts(w._3) >= 2)
    dup.groupBy(_._1).view.mapValues { ps =>
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { p =>
        spans.lastOption match {
          case Some((s, lastStart)) if p - lastStart <= K =>
            spans(spans.length - 1) = (s, p)
          case _ => spans += ((p, p))
        }
      }
      spans.map { case (s, e) => (s, e + K - 1, e + K - 1 - s + 1) }.toSeq
    }.toMap.filter(_._2.nonEmpty)
  }

  test("substringSpans matches the naive mark-and-merge reference") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(6, genDoc)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.substringSpans(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = K)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      got == naive(docs)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
