package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofRangeJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofLe: most recent right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "e1"),
      ("u1", ts("2024-01-01 12:00:00"), "e2"),
      ("u1", ts("2024-01-01 09:00:00"), "e0"), // before any right row
      ("u2", ts("2024-01-01 12:00:00"), "e3")) // key with no right rows
      .toDF("k", "t", "ev")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1L, 10.0),
      ("u1", ts("2024-01-01 11:00:00"), 2L, 20.0),
      ("u1", ts("2024-01-01 13:00:00"), 3L, 30.0))
      .toDF("k", "rt", "rid", "rv")
    val got = AsofJoin.asofLe(left, right, Seq("k"), "t", "rt", "rid",
      Seq("rid", "rv"))
      .select("ev", "rid", "rv")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      ("e0", None, None),                 // nothing at or before 09:00
      ("e1", Some(1L), Some(10.0)),       // 09:30 row
      ("e2", Some(2L), Some(20.0)),       // 11:00 row, not 13:00
      ("e3", None, None)))                // no rows for u2
  }

  test("asofLe: inclusive at equal timestamps; max tieBreak wins ties") {
    import spark.implicits._
    val left = Seq(("u1", ts("2024-01-01 10:00:00"), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 5L, 50.0), // same instant as left
      ("u1", ts("2024-01-01 10:00:00"), 7L, 70.0), // tie: higher rid wins
      ("u1", ts("2024-01-01 09:00:00"), 1L, 10.0))
      .toDF("k", "rt", "rid", "rv")
    val got = AsofJoin.asofLe(left, right, Seq("k"), "t", "rt", "rid",
      Seq("rid", "rv")).select("rid", "rv").head()
    assert((got.getLong(0), got.getDouble(1)) == ((7L, 70.0)))
  }

  test("pointInInterval matches a naive range join, boundaries half-open") {
    import spark.implicits._
    val fact = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 50.0),
      (6L, -5.0), (7L, 100.0)).toDF("id", "v")
    val ranges = Seq(
      ("a", 0.0, 10.0), ("b", 10.0, 50.0),
      ("c", 20.0, 30.0), // overlaps b: v=25 matches both
      ("d", -10.0, 0.0))
      .toDF("name", "lo", "hi")
    val naive = fact.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (width <- Seq(1.0, 7.0, 10.0, 100.0)) {
      val got = RangeJoin.pointInInterval(fact, "v", ranges, "lo", "hi", width)
        .select("id", "name")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == naive, s"width=$width")
    }
    assert(naive == Set((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (4L, "c"),
      (6L, "d")))
  }

  test("intervalOverlap: half-open semantics, cross-bucket pairs appear exactly once") {
    import spark.implicits._
    val a = Seq(
      (1L, 0L, 10L),    // spans buckets 0-2 at width 4
      (2L, 10L, 12L),   // touches 3L's start: [10,12) vs [12,20) do NOT overlap
      (3L, 100L, 101L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 8L, 16L),   // overlaps 1 ([0,10)) across bucket boundary AND 2
      (11L, 12L, 20L),  // overlaps nothing ([10,12) ends at its start)
      (12L, 0L, 200L))  // giant interval: overlaps all three
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        bucketWidth = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(3))) // aid, bid
    // exactly once per overlapping pair — no duplicate from shared buckets
    assert(got.length == got.distinct.length, s"dupes in ${got.toSeq}")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (1L, 12L), (2L, 12L), (3L, 12L)))
  }

  test("levenshteinVerify computes edit distance on candidate pairs only") {
    import spark.implicits._
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten"), (4L, "zzz"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = Dedup.levenshteinVerify(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3), (1L, 3L, 0)))
  }
}
