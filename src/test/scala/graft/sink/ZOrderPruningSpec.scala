package graft.sink

import graft.SparkSpec

/** Z-order pruning audit on an 8×8 grid, 16 buckets of 4 rows: linear
  * (a,b)-sort buckets are (a, b-half) strips; z-order buckets are 2×2
  * squares. Every expected count is hand-derivable. */
class ZOrderPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid =
    (for (a <- 0 until 8; b <- 0 until 8) yield (a.toLong, b.toLong))
      .toDF("a", "b")

  private lazy val audit = StoreLayout.zOrderPruningAudit(
    grid, "a", "b", bits = 3, numBuckets = 16,
    boxes = Seq(
      ("corner", 0L, 1L, 0L, 1L),   // 2×2 corner box
      ("b_band", 0L, 7L, 2L, 3L)))  // full-width horizontal band
    .collect()
    .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap

  test("corner box: one z square vs two linear strips") {
    assert(audit(("zorder", "corner")) === 1L)
    assert(audit(("linear", "corner")) === 2L)
  }

  test("orthogonal band: z prunes where the linear sort cannot") {
    // every a-strip has a b∈[0,3] bucket intersecting the band → 8 hits;
    // z-order touches only the 4 squares with b∈{2,3}
    assert(audit(("linear", "b_band")) === 8L)
    assert(audit(("zorder", "b_band")) === 4L)
  }
}
