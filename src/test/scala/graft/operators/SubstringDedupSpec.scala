package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Exact substring-span dedup (Lee et al. 2021 shape): duplicated k-gram
  * windows merged into maximal per-doc spans, plus the per-doc accounting
  * fold. Constructed corpora with known duplicated runs. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4

  // docs 1 and 2 share an exact 6-token run ("one two three four five six")
  // → 4-gram windows at positions 1..3 of that run duplicate; doc 3 is
  // clean; doc 4 is shorter than one window; doc 5 repeats a run WITHIN
  // itself (self-duplication counts: corpus occurrence >= 2).
  private lazy val docs = Seq(
    (1L, "one two three four five six alpha beta gamma delta"),
    (2L, "zeta one two three four five six eta theta"),
    (3L, "unique tokens only here nothing repeats anywhere at all"),
    (4L, "too few"),
    (5L, "p q r s filler1 filler2 p q r s")
  ).toDF("doc_id", "text")

  private lazy val spans =
    Dedup.substringSpans(docs, "text", "doc_id", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("shared run across docs becomes one maximal span on each side") {
    // doc 1: run at tokens 1..6; doc 2: same run at tokens 2..7
    assert(spans.filter(_._1 == 1L) === Seq((1L, 1L, 6L, 6L)))
    assert(spans.filter(_._1 == 2L) === Seq((2L, 2L, 7L, 6L)))
  }

  test("clean and too-short docs produce no spans") {
    assert(!spans.exists(_._1 == 3L))
    assert(!spans.exists(_._1 == 4L))
  }

  test("within-document repetition is duplication") {
    // doc 5: "p q r s" at tokens 1..4 and 7..10 — two disjoint spans
    assert(spans.filter(_._1 == 5L) === Seq((5L, 1L, 4L, 4L), (5L, 7L, 10L, 4L)))
  }

  test("spans are maximal: length >= k, disjoint, non-adjacent") {
    spans.groupBy(_._1).foreach { case (_, ss) =>
      ss.foreach { case (_, s, e, n) =>
        assert(n == e - s + 1 && n >= k)
      }
      ss.toSeq.sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) =>
          // a shared boundary or 1-token gap would have merged
          assert(s2 > e1 + 1)
        case _ =>
      }
    }
  }

  test("stats fold matches the span table and covers clean docs") {
    val stats = Dedup.substringDedupStats(docs, "text", "doc_id", k = k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val dupByDoc = spans.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(stats.keySet === Set(1L, 2L, 3L, 4L, 5L))
    stats.foreach { case (id, (nTok, nDup, nKept)) =>
      assert(nDup === dupByDoc.getOrElse(id, 0L))
      assert(nKept === nTok - nDup)
    }
    assert(stats(5L)._1 === 10L && stats(5L)._2 === 8L)
    assert(stats(4L) === ((2L, 0L, 2L)))
  }
}
