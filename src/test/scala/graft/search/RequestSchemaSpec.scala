package graft.search

import graft.SparkSpec
import graft.functions.Embedder
import org.apache.spark.sql.functions._

/** The SearchMemory request contract: every schema bound loaded from the
  * packaged JSON (reference: search_tool_schema.json:10-18,87-93) and every
  * handler runtime check (handler.py:38-48) is enforced by
  * SearchRequest.validate / Search.searchMemory.
  */
class RequestSchemaSpec extends SparkSpec {

  test("schema file loads the reference's constraint set") {
    assert(RequestSchema.toolName == "SearchMemory")
    assert(RequestSchema.queryMaxLength == 1000)
    assert(RequestSchema.limitMin == 1 && RequestSchema.limitMax == 100)
    assert(RequestSchema.limitDefault == 3)
    assert(RequestSchema.searchTypes == Seq("basic", "filtered", "by_memory_id"))
    assert(RequestSchema.details == Seq("compact", "summary", "graph", "full"))
    assert(RequestSchema.thresholdMin == 0.0 && RequestSchema.thresholdMax == 1.0)
    assert(RequestSchema.thresholdDefault == 0.4)
    assert(RequestSchema.filterFields.size == 12)
    // the reference's 7 operators plus the engine's explicit substring form
    assert(RequestSchema.filterOps ==
      Seq("is", "is_not", "before", "after", "between", "contains",
        "contains_substring", "any_of"))
    assert(RequestSchema.requiredParams == Seq("query"))
  }

  private def bad(req: SearchRequest, needle: String): Unit = {
    val e = intercept[IllegalArgumentException](req.validate)
    assert(e.getMessage.contains(needle), s"message was: ${e.getMessage}")
  }

  test("limit outside [1, 100] is rejected") {
    bad(SearchRequest("q", limit = 0), "limit")
    bad(SearchRequest("q", limit = -5), "limit")
    bad(SearchRequest("q", limit = 101), "limit")
    SearchRequest("q", limit = 1).validate
    SearchRequest("q", limit = 100).validate
  }

  test("query longer than maxLength is rejected") {
    bad(SearchRequest("x" * 1001), "maxLength")
    SearchRequest("x" * 1000).validate
  }

  test("score_threshold outside [0, 1] is rejected") {
    bad(SearchRequest("q", scoreThreshold = -0.1), "score_threshold")
    bad(SearchRequest("q", scoreThreshold = 1.5), "score_threshold")
    SearchRequest("q", scoreThreshold = 0.0).validate
    SearchRequest("q", scoreThreshold = 1.0).validate
  }

  test("unknown search_type raises the reference's error shape") {
    bad(SearchRequest("q", searchType = "fuzzy"), "Unknown search type: fuzzy")
  }

  test("empty query rejected for basic and by_memory_id, allowed for filtered") {
    bad(SearchRequest(""), "Query cannot be empty")
    bad(SearchRequest("   ", searchType = "by_memory_id"), "Query cannot be empty")
    // filtered searches semantic-score with an empty query (strategies.py:283-289)
    SearchRequest("", searchType = "filtered").validate
  }

  test("unknown detail view and filter field/operator are rejected") {
    bad(SearchRequest("q", detail = "verbose"), "unknown detail view")
    bad(SearchRequest("q", filters = Seq(
      Filters.FilterSpec("no_such_field", "is", Filters.SV("x")))), "unknown filter field")
    bad(SearchRequest("q", filters = Seq(
      Filters.FilterSpec("tool", "like", Filters.SV("x")))), "unknown operator")
  }

  test("searchMemory envelope dispatches strategies and projects the view") {
    import spark.implicits._
    val dims = 8
    val mem = Seq(
      ("1", "s1", "click", "first", 1L, null.asInstanceOf[String], "alpha clicks"),
      ("2", "s1", "view", "second", 2L, "1", "beta views"),
      ("3", "s2", "click", "third", 1L, null.asInstanceOf[String], "gamma clicks"))
      .toDF("memory_id", "session_id", "tool", "title", "sequence_order",
        "preceding_memory_id", "content")
      .withColumn("embedding", Embedder.embed(col("content"), dims))

    val basic = Search.searchMemory(mem, "embedding", dims,
      SearchRequest("alpha clicks", limit = 2, scoreThreshold = 0.0, detail = "compact"))
    // compact view: the FULL reference field list (missing fields → NULL)
    assert(basic.columns.toSeq ==
      Seq("memory_id", "title", "tool", "context", "session_id", "score"))
    assert(basic.count() == 2)

    val graph = Search.searchMemory(mem, "embedding", dims,
      SearchRequest("beta", limit = 3, scoreThreshold = 0.0, detail = "graph"))
    assert(graph.columns.contains("preceding_memory_id"))

    val byId = Search.searchMemory(mem, "embedding", dims,
      SearchRequest("2", searchType = "by_memory_id", detail = "full"))
      .collect()
    assert(byId.length == 1 && byId(0).getAs[Double]("score") == 1.0)

    // invalid request surfaces through the envelope too
    intercept[IllegalArgumentException] {
      Search.searchMemory(mem, "embedding", dims, SearchRequest("q", limit = 0))
    }
  }
}
