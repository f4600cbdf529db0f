package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class ScdSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("buildScd2: collapses identical consecutive states, intervals chain") {
    import spark.implicits._
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "new", 1.0),
      (1L, ts("2024-01-02 00:00:00"), 11L, "new", 1.0), // identical → collapses
      (1L, ts("2024-01-03 00:00:00"), 12L, "paid", 1.0),
      (1L, ts("2024-01-04 00:00:00"), 13L, "paid", 2.0), // value change → new version
      (2L, ts("2024-01-01 00:00:00"), 20L, "new", 5.0))
      .toDF("k", "t", "id", "status", "v")
    val got = Scd.buildScd2(updates, "k", "t", "id", Seq("status", "v"))
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getString(1), r.getDouble(2), r.getString(4), r.getString(5), r.getBoolean(6)))
      .toMap
    assert(got((1L, 1)) == (("new", 1.0, "2024-01-01 00:00:00", "2024-01-03 00:00:00", false)))
    assert(got((1L, 2)) == (("paid", 1.0, "2024-01-03 00:00:00", "2024-01-04 00:00:00", false)))
    assert(got((1L, 3)) == (("paid", 2.0, "2024-01-04 00:00:00", null, true)))
    assert(got((2L, 1)) == (("new", 5.0, "2024-01-01 00:00:00", null, true)))
    assert(got.size == 4)
  }

  test("buildScd2: same-timestamp updates ordered by the tie column") {
    import spark.implicits._
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "b", 0.0),
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0))
      .toDF("k", "t", "id", "status", "v")
    val got = Scd.buildScd2(updates, "k", "t", "id", Seq("status", "v"))
      .collect().map(r => r.getInt(3) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "b")) // id=1 first despite equal ts
  }

  test("applyScd2: incremental fold equals full rebuild, versions continue") {
    import spark.implicits._
    val all = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "new", 1.0),
      (1L, ts("2024-01-03 00:00:00"), 11L, "paid", 1.0),
      (1L, ts("2024-01-10 00:00:00"), 12L, "paid", 1.0),  // collapses across the split
      (1L, ts("2024-01-12 00:00:00"), 13L, "done", 1.0),
      (2L, ts("2024-01-02 00:00:00"), 20L, "new", 5.0),   // no updates after split
      (3L, ts("2024-01-11 00:00:00"), 30L, "new", 7.0))   // key born after split
      .toDF("k", "t", "id", "status", "v")
    val cut = ts("2024-01-05 00:00:00")
    val dim = Scd.buildScd2(all.where($"t" < cut), "k", "t", "id", Seq("status", "v"))
    val inc = Scd.applyScd2(dim, all.where($"t" >= cut), "k", "t", "id", Seq("status", "v"))
    val full = Scd.buildScd2(all, "k", "t", "id", Seq("status", "v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getString(4),
        if (r.isNullAt(5)) null else r.getString(5), r.getBoolean(6))).toSet
    assert(rows(inc) == rows(full))
    // the collapse across the split boundary actually happened
    assert(rows(full).count(_._1 == 1L) == 3) // new, paid (merged), done
  }

  test("applyScd2: non-numeric tie column fails fast instead of silently nulling ties") {
    import spark.implicits._
    val base = Seq((1L, ts("2024-01-01 00:00:00"), 10L, "new", 1.0))
      .toDF("k", "t", "id", "status", "v")
    val dim = Scd.buildScd2(base, "k", "t", "id", Seq("status", "v"))
    val strTies = Seq((1L, ts("2024-01-02 00:00:00"), "b", "paid", 1.0))
      .toDF("k", "t", "id", "status", "v")
    val e = intercept[IllegalArgumentException] {
      Scd.applyScd2(dim, strTies, "k", "t", "id", Seq("status", "v"))
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("diffSnapshots: added / removed / changed, unchanged dropped, null-safe") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("x"), 1.0), (2L, Some("y"), 2.0), (3L, None: Option[String], 3.0),
      (4L, Some("z"), 4.0))
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("x"), 1.0),                 // unchanged → dropped
      (2L, Some("y2"), 2.0),                // changed (string)
      (3L, None: Option[String], 3.0),      // unchanged incl. NULL == NULL
      (5L, Some("w"), 5.0))                 // added; 4 removed
      .toDF("k", "s", "v")
    val got = Scd.diffSnapshots(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("cdcApply: highest sequence wins, winning delete removes the key, ties break on the second seq col") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, 10L, "U", "a"),  // superseded
      (1L, 2L, 11L, "U", "b"),  // winner for key 1
      (2L, 1L, 20L, "U", "c"),
      (2L, 3L, 21L, "D", "d"),  // delete wins → key 2 gone
      (3L, 5L, 30L, "D", "e"),  // deleted...
      (3L, 5L, 31L, "U", "f")   // ...same seq1, higher seq2 U wins → kept
    ).toDF("k", "seq1", "seq2", "op", "payload")
    val out = Scd.cdcApply(log, "k", Seq("seq1", "seq2"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out == Map(1L -> "b", 3L -> "f"))
  }

  test("cdcWinners fold: tombstones block late lower-sequence resurrection") {
    import spark.implicits._
    // batch 1 deletes key 1 at seq 10; batch 2 delivers a LATE update at
    // seq 5 — the tombstone must win the fold, so the key stays deleted
    val b1 = Seq((1L, 10L, "D", "x"), (2L, 1L, "U", "keep"))
      .toDF("k", "seq", "op", "p")
    val b2 = Seq((1L, 5L, "U", "resurrect?")).toDF("k", "seq", "op", "p")
    val fold = Scd.cdcWinners(
      Scd.cdcWinners(b1, "k", Seq("seq"))
        .unionByName(Scd.cdcWinners(b2, "k", Seq("seq"))),
      "k", Seq("seq"))
    val live = fold.where(org.apache.spark.sql.functions.col("op") =!= "D")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(live == Map(2L -> "keep"))
    // and the fold equals the one-pass batch apply
    val onePass = Scd.cdcApply(b1.unionByName(b2), "k", Seq("seq"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(live == onePass)
  }
}
