package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the anchor-intersection phrase semantics — including the two
  * classically fiddly cases: overlapping matches of a repeated-term
  * phrase, and partial matches that share all but one term — plus the
  * k-anonymity class flags.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("phraseMatches finds every start position, overlapping included") {
    val docs = Seq(
      (1L, "a b a b a"),   // "a b" at 0 and 2
      (2L, "a a a"),       // "a a" overlaps: 0 and 1
      (3L, "b a"),         // reversed — no "a b"
      (4L, "x a y b")      // both terms, never adjacent
    ).toDF("doc_id", "text")
    val ab = PhraseSearch.phraseMatches(docs, "text", "doc_id", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ab == Map(1L -> ((2L, 0L))))
    val aa = PhraseSearch.phraseMatches(docs, "text", "doc_id", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aa == Map(2L -> ((2L, 0L))))
  }

  test("kAnonymityAudit flags classes under k") {
    val df = Seq(("en", "s1"), ("en", "s1"), ("en", "s1"), ("de", "s2"))
      .toDF("lang", "source")
    val out = Profiling.kAnonymityAudit(df, Seq("lang", "source"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(("en", "s1") -> ((3L, false)), ("de", "s2") -> ((1L, true))))
  }
}
