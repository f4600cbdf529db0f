package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  private def points = {
    import spark.implicits._
    Seq(
      ("m1", Seq(1.0f, 0.0f), "click"),
      ("m2", Seq(0.9f, 0.1f), "view"),
      ("m3", Seq(0.0f, 1.0f), "click"),
      ("m4", Seq(-1.0f, 0.0f), "view"))
      .toDF("memory_id", "embedding", "tool")
  }

  test("basic: cosine top-k with threshold applied AFTER ranking (P7/O8)") {
    // limit 3 picks scores {1.0, ~0.994, 0.0}; threshold 0.5 then drops the
    // third — post-rank placement must NOT let m4 (-1.0) back in
    val got = Search.basic(points, "embedding", Seq(1.0f, 0.0f),
      limit = 3, scoreThreshold = 0.5)
      .select("memory_id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("m1", "m2"))
  }

  test("basic with filters prunes before scoring") {
    val got = Search.basic(points, "embedding", Seq(1.0f, 0.0f),
      limit = 2, scoreThreshold = -2.0,
      filters = Seq(Filters.FilterSpec("tool", "is", Filters.SV("view"))))
      .select("memory_id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("m2", "m4"))
  }

  test("byId returns constant score 1.0 (T3)") {
    val got = Search.byId(points, "memory_id", Seq("m3", "m1"))
      .select("memory_id", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set(("m1", 1.0), ("m3", 1.0)))
  }

  test("rrfFuse combines dense and keyword ranks with k=60") {
    import spark.implicits._
    val scored = Seq(("a", 0.9, 1.0), ("b", 0.8, 3.0), ("c", 0.1, 2.0))
      .toDF("id", "dense", "kw")
    val got = Search.rrfFuse(scored, col("dense"), col("kw"), col("id"))
      .select("id", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - (1.0 / 61 + 1.0 / 63)) < 1e-12)
    assert(math.abs(got("b") - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got("c") - (1.0 / 63 + 1.0 / 62)) < 1e-12)
  }

  test("view projections select the declared column lists (P3)") {
    import spark.implicits._
    val df = Seq(("m1", "t", "ti", "c", 1))
      .toDF("memory_id", "tool", "title", "content", "sequence_order")
    assert(Search.project(df, "compact").columns.toSeq == Seq("memory_id", "tool", "title"))
    assert(Search.project(df, "summary").columns.toSeq ==
      Seq("memory_id", "tool", "title", "content", "sequence_order"))
    intercept[IllegalArgumentException](Search.project(df, "wat"))
  }

  test("lshSearch returns the query's own bucket ranked by cosine") {
    import spark.implicits._
    val vecs = (0 until 50).map { i =>
      val angle = i * math.Pi / 50
      (i.toLong, Seq(math.cos(angle).toFloat, math.sin(angle).toFloat, 0.1f, 0.2f))
    }.toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0.05f, 0.1f, 0.2f)
    val got = Search.lshSearch(vecs, "embedding", q, planes = 2, seed = 3,
      limit = 5, tieBreak = "vec_id")
      .select("vec_id", "score").collect()
    assert(got.nonEmpty && got.length <= 5)
    // scores are sorted descending
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
