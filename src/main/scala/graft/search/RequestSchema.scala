package graft.search

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._
import scala.io.Source

/** The SearchMemory request contract, loaded from the packaged schema file
  * instead of hard-coded (reference: fegis/config.py:61-71 derives the tool
  * surface from search_tool_schema.json; constraints at
  * search_tool_schema.json:10-18,87-93).
  *
  * Loading the JSON keeps a single source of truth for bounds, enums and
  * defaults — [[SearchRequest.validate]] reads every constraint from here,
  * so tightening the schema file tightens the API with no Scala change.
  */
object RequestSchema {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/graft/search_request_schema.json")
    require(in != null, "graft/search_request_schema.json missing from classpath")
    val txt = try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    new ObjectMapper().readTree(txt)
  }

  private val props = root.path("inputSchema").path("properties")

  private def enumOf(node: JsonNode): Seq[String] =
    node.path("enum").elements().asScala.map(_.asText()).toSeq

  val toolName: String = root.path("name").asText()

  val queryMaxLength: Int = props.path("query").path("maxLength").asInt()

  val limitMin: Int = props.path("limit").path("minimum").asInt()
  val limitMax: Int = props.path("limit").path("maximum").asInt()
  val limitDefault: Int = props.path("limit").path("default").asInt()

  val searchTypes: Seq[String] = enumOf(props.path("search_type"))
  val searchTypeDefault: String = props.path("search_type").path("default").asText()

  val details: Seq[String] = enumOf(props.path("detail"))
  val detailDefault: String = props.path("detail").path("default").asText()

  val thresholdMin: Double = props.path("score_threshold").path("minimum").asDouble()
  val thresholdMax: Double = props.path("score_threshold").path("maximum").asDouble()
  val thresholdDefault: Double = props.path("score_threshold").path("default").asDouble()

  val filterFields: Seq[String] =
    enumOf(props.path("filters").path("items").path("properties").path("field"))

  val filterOps: Seq[String] =
    enumOf(props.path("filters").path("items").path("properties").path("operator"))

  val requiredParams: Seq[String] =
    root.path("inputSchema").path("required").elements().asScala.map(_.asText()).toSeq
}

/** A validated SearchMemory request envelope. Construction does NOT
  * validate (so tests can build invalid requests); [[validate]] enforces
  * every schema constraint plus the handler's runtime checks
  * (reference: search/handler.py:38-48) and throws the reference's error
  * shapes as IllegalArgumentException.
  */
final case class SearchRequest(
    query: String,
    searchType: String = RequestSchema.searchTypeDefault,
    limit: Int = RequestSchema.limitDefault,
    scoreThreshold: Double = RequestSchema.thresholdDefault,
    detail: String = RequestSchema.detailDefault,
    filters: Seq[Filters.FilterSpec] = Nil) {

  import RequestSchema._

  /** Throws on the first violated constraint; returns `this` for chaining. */
  def validate: SearchRequest = {
    require(query != null, "query is required")
    require(query.length <= queryMaxLength,
      s"query exceeds maxLength $queryMaxLength (got ${query.length} chars)")
    require(limit >= limitMin && limit <= limitMax,
      s"limit must be in [$limitMin, $limitMax], got $limit")
    require(scoreThreshold >= thresholdMin && scoreThreshold <= thresholdMax,
      s"score_threshold must be in [$thresholdMin, $thresholdMax], got $scoreThreshold")
    if (!searchTypes.contains(searchType))
      throw new IllegalArgumentException(s"Unknown search type: $searchType")
    if (!details.contains(detail))
      throw new IllegalArgumentException(
        s"unknown detail view '$detail' (allowed: ${details.mkString(", ")})")
    // handler.py:41-44 — semantic and point-lookup searches need a query
    if ((searchType == "basic" || searchType == "by_memory_id") && query.trim.isEmpty)
      throw new IllegalArgumentException(
        "Query cannot be empty for semantic and by_memory_id searches")
    filters.foreach { f =>
      if (!filterFields.contains(f.field))
        throw new IllegalArgumentException(
          s"unknown filter field '${f.field}' (allowed: ${filterFields.mkString(", ")})")
      if (!filterOps.contains(f.op))
        throw new IllegalArgumentException(
          s"unknown operator '${f.op}' (allowed: ${filterOps.mkString(", ")})")
    }
    this
  }
}
