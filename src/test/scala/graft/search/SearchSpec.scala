package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic fake with DISTINCT per-text geometry (hash-spread
  * components, not length-monotone) so rankings are non-trivial;
  * top-level so the closure ships without dragging the spec instance.
  */
class HashFakeEmbedder extends graft.functions.TextEmbedder {
  override def embedBatch(texts: Seq[String], dims: Int): Seq[Array[Double]] =
    texts.map { t =>
      Array.tabulate(dims) { d =>
        (math.abs((t + "#" + d).hashCode) % 997).toDouble / 997.0 - 0.5
      }
    }
}

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

  test("basicByText rankings are invariant to the seam's batch boundaries (X102)") {
    import spark.implicits._
    val fake = new HashFakeEmbedder
    val corpus = (1L to 37L).map(i => (s"m$i", s"memory text $i payload"))
      .toDF("memory_id", "text").repartition(4)
    // pathological batch boundaries: 1 (every row its own batch) vs >=N
    // (one batch per partition) vs a stride that straddles partitions
    def rank(bs: Int): Seq[(String, Double)] = {
      val pts = graft.functions.TextEmbedder.embedText(
        corpus, "text", "emb", dims = 8, batchSize = bs, embedder = fake)
      Search.basicByText(pts, "emb", "memory text 19 payload", dims = 8,
        limit = 10, scoreThreshold = -2.0, embedder = fake)
        .select("memory_id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    val r1 = rank(1)
    val r3 = rank(3)
    val rN = rank(1000)
    assert(r1 == r3 && r3 == rN,
      s"batch boundaries changed rankings:\n1: $r1\n3: $r3\nN: $rN")
    // the query's own document ranks first at cosine 1.0
    assert(r1.head._1 == "m19" && r1.head._2 == 1.0, r1.head)
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

  test("view projections carry the reference's exact field lists (P3)") {
    import spark.implicits._
    val df = Seq(("m1", "t", "ti", "First part. Second part. Third part.", 1))
      .toDF("memory_id", "tool", "title", "content", "sequence_order")
      .withColumn("timestamp", to_timestamp(lit("2024-01-30 23:00:00")))
      .withColumn("context", lit(""))
      .withColumn("session_id", lit("s1"))
      .withColumn("score", lit(0.5))
      .withColumn("preceding_memory_id", lit(null).cast("string"))
      .withColumn("parameters", lit("{}"))
      .withColumn("frames", lit("{}"))
      .withColumn("meta", struct(
        lit("agent-1").as("agent_id"), lit("1.0").as("schema_version"),
        lit("0.1.0").as("fegis_version"), lit("T").as("archetype_title"),
        lit("1.0.0").as("archetype_version")))
    // field sets and ORDER mirror RESULT_VIEWS (formatters.py:28-74)
    assert(Search.project(df, "compact").columns.toSeq ==
      Seq("memory_id", "title", "tool", "context", "session_id", "score"))
    assert(Search.project(df, "summary").columns.toSeq ==
      Seq("memory_id", "title", "context", "tool", "score",
        "content_preview", "relative_time", "session_id"))
    assert(Search.project(df, "graph").columns.toSeq ==
      Seq("memory_id", "title", "preceding_memory_id", "session_id",
        "sequence_order", "tool", "relative_time", "timestamp", "score",
        "meta.agent_id", "meta.archetype_title"))
    assert(Search.project(df, "full").columns.toSeq ==
      Seq("memory_id", "score", "title", "content", "context", "tool",
        "session_id", "sequence_order", "timestamp", "preceding_memory_id",
        "parameters", "frames", "meta"))
    intercept[IllegalArgumentException](Search.project(df, "wat"))

    val now = to_timestamp(lit("2024-01-31 00:00:00"))
    val g = Search.project(df, "graph", now).head()
    assert(g.getAs[String]("relative_time") == "1 hour ago")
    assert(g.getAs[String]("timestamp") == "2024-01-30T23:00:00.000000")
    assert(g.getAs[String]("meta.agent_id") == "agent-1")
    val f = Search.project(df, "full").head()
    assert(f.getAs[String]("meta") ==
      """{"agent_id":"agent-1","schema_version":"1.0","fegis_version":"0.1.0","archetype_title":"T","archetype_version":"1.0.0"}""")
    val s = Search.project(df, "summary", now).head()
    assert(s.getAs[String]("content_preview") == "First part. Second part. Third part.")

    // a field the rows don't carry projects as NULL (reference dict.get)
    val sparse = Seq(("m2", "t2", 0.9)).toDF("memory_id", "tool", "score")
    val c = Search.project(sparse, "compact").head()
    assert(c.isNullAt(c.fieldIndex("context")) && c.isNullAt(c.fieldIndex("title")))
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
