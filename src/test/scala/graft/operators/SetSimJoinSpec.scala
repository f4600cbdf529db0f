package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("prefix filtering reproduces the full-inverted-index exact join bit-for-bit") {
    val pref = SetSimJoin.jaccardPairs(corpus, "text", "doc_id",
      minSim = 0.5, termK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleK = 2, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full, s"prefix=${pref.size} full=${full.size}")
    assert(pref.nonEmpty)
  }

  test("the prefix index actually prunes the candidate space, harder as t rises") {
    // t=0.5 indexes about half of each (short) set — modest pruning;
    // t=0.9 indexes ~10% of each set and the candidate space collapses
    val (pref05, full) = SetSimJoin.candidateCounts(corpus, "text",
      "doc_id", minSim = 0.5, termK = 2)
    val (pref09, _) = SetSimJoin.candidateCounts(corpus, "text",
      "doc_id", minSim = 0.9, termK = 2)
    assert(pref05 > 0 && pref05 < full,
      s"t=0.5: prefix $pref05 vs full $full")
    assert(pref09 < full / 5,
      s"t=0.9: prefix $pref09 vs full $full — filter isn't earning its keep")
  }

  test("threshold 1.0 pairs only identical term sets (prefix length 1)") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta delta"),
      (4L, "zz yy xx")
    ).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardPairs(df, "text", "doc_id",
      minSim = 1.0, termK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("token multiplicity is ignored: sets, not bags") {
    val df = Seq(
      (1L, "a a a b"),
      (2L, "a b b b")
    ).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardPairs(df, "text", "doc_id",
      minSim = 0.9, termK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }
}
