package graft.operators

import graft.SparkSpec

/** Embedding covariance/correlation on hand-computable 2-D vectors. */
class EmbeddingCovSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly correlated dimensions: cov = 8/3, corr = 1") {
    val vecs = Seq(Seq(1f, 2f), Seq(3f, 4f), Seq(5f, 6f)).toDF("embedding")
    val got = Profiling.embeddingCovariance(vecs, "embedding", dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got((0, 0)) === ((2.666667, 1.0)))
    assert(got((1, 1)) === ((2.666667, 1.0)))
    assert(got((0, 1)) === ((2.666667, 1.0)))
  }

  test("anti-correlated pair and a constant dimension") {
    val vecs = Seq(Seq(1f, 6f, 5f), Seq(3f, 4f, 5f), Seq(5f, 2f, 5f))
      .toDF("embedding")
    val got = Profiling.embeddingCovariance(vecs, "embedding", dims = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got((0, 1)) === ((-2.666667, Some(-1.0))))
    // constant dim: zero variance, corr undefined → NULL, not a crash
    assert(got((2, 2)) === ((0.0, None)))
    assert(got((0, 2)) === ((0.0, None)))
  }

  test("zero covariance cells are +0.0, never IEEE -0.0") {
    // dim-1 deviations are (-1, 0, +1) against a constant dim-0: the
    // float chain can land on -0.0; the contract (shared with the DuckDB
    // oracle's ROUND(...) + 0.0) is that every zero serializes as +0.0
    val vecs = Seq(Seq(5f, 1f), Seq(5f, 2f), Seq(5f, 3f)).toDF("embedding")
    val got = Profiling.embeddingCovariance(vecs, "embedding", dims = 2)
      .collect()
    got.foreach { r =>
      val c = r.getDouble(2)
      if (c == 0.0)
        assert(java.lang.Double.doubleToRawLongBits(c) == 0L,
          s"cov cell (${r.getInt(0)},${r.getInt(1)}) is -0.0")
      if (!r.isNullAt(3)) {
        val k = r.getDouble(3)
        if (k == 0.0)
          assert(java.lang.Double.doubleToRawLongBits(k) == 0L,
            s"corr cell (${r.getInt(0)},${r.getInt(1)}) is -0.0")
      }
    }
    // and r6's normalization itself: a tiny negative rounds to +0.0
    val cells = Profiling.embeddingCovariance(
      Seq(Seq(1f, 1e-9f), Seq(1f, -1e-9f)).toDF("embedding"),
      "embedding", dims = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(java.lang.Double.doubleToRawLongBits(cells((0, 1))) == 0L)
  }
}
