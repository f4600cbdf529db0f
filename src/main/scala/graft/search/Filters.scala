package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 7-operator filter algebra compiled to Catalyst `Column`
  * trees (reference: fegis/search/strategies.py:87-259,
  * fegis/search_tool_schema.json:25-80).
  *
  * A filter is `{field, operator, value}`; a request carries a list of
  * filters AND-combined (`must`, strategies.py:96-114). `contains` is the
  * reference's Qdrant `MatchText` (strategies.py:240-259): TOKENIZED
  * full-text matching — every word of the query must appear as a whole
  * word of the field, so "cat" never matches "concatenate" — with the
  * {value, lower, capitalize} variant-OR subsumed by lowercased tokens.
  * Plain substring matching stays available as the explicit
  * `contains_substring` engine extension.
  *
  * Compiling to `Column` (instead of executing) means Catalyst pushes every
  * compiled predicate into the parquet scan — the scale replacement for the
  * reference's 12 Qdrant payload indexes (storage.py:71-111).
  */
object Filters {

  sealed trait FilterValue
  final case class SV(s: String) extends FilterValue
  final case class NV(n: Double) extends FilterValue
  final case class AV(vs: Seq[String]) extends FilterValue
  final case class RV(lo: FilterValue, hi: FilterValue) extends FilterValue

  final case class FilterSpec(field: String, op: String, value: FilterValue)

  /** API-name → column-path mapping (reference: strategies.py:27-32). */
  val fieldMap: Map[String, String] = Map(
    "agent_id" -> "meta.agent_id",
    "schema_version" -> "meta.schema_version",
    "archetype_title" -> "meta.archetype_title",
    "archetype_version" -> "meta.archetype_version")

  val allowedOps: Set[String] =
    Set("is", "is_not", "before", "after", "between", "contains",
      "contains_substring", "any_of")

  /** Word tokenizer backing `contains` on both the engine side and any SQL
    * twin: maximal `[a-z0-9]+` runs of the lowercased text (the shape of
    * Qdrant's default "word" tokenizer — split on every non-alphanumeric).
    */
  val TokenPattern = "[a-z0-9]+"

  private def textTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  /** Driver-side twin of [[textTokens]] for the (literal) query string. */
  def tokenize(s: String): Seq[String] =
    TokenPattern.r.findAllIn(s.toLowerCase).toSeq

  private def resolve(field: String): Column = col(fieldMap.getOrElse(field, field))

  private def litOf(v: FilterValue, temporal: Boolean): Column = v match {
    case SV(s) if temporal => to_timestamp(lit(s.replace("Z", "+00:00")))
    case SV(s)             => lit(s)
    case NV(n)             => lit(n)
    case other => throw new IllegalArgumentException(s"scalar expected, got $other")
  }

  /** Compile one filter spec to a predicate Column.
    * Validation mirrors strategies.py:120-158 — unknown operator or
    * malformed value is an error, not a silent no-op.
    */
  def compile(f: FilterSpec): Column = {
    val c = resolve(f.field)
    val temporal = f.field == "timestamp" || f.field.endsWith("_at") || f.field == "ts"
    f.op match {
      case "is"     => c === litOf(f.value, temporal)
      // null-safe exclusion: MatchExcept keeps points where field != v,
      // including points where the field is absent (strategies.py:172-175)
      case "is_not" => !(c <=> litOf(f.value, temporal))
      case "before" => c < litOf(f.value, temporal)
      case "after"  => c > litOf(f.value, temporal)
      case "between" => f.value match {
        case RV(lo, hi) => c >= litOf(lo, temporal) && c <= litOf(hi, temporal)
        case other => throw new IllegalArgumentException(s"between needs [min,max], got $other")
      }
      // MatchText: every query token must be a whole token of the field.
      // An empty token list matches everything (empty MatchText). The
      // token array is a per-row regexp expression — like every text
      // predicate it evaluates post-scan (no parquet pushdown), which is
      // the same place Qdrant's full-text index sits in the reference.
      case "contains" => f.value match {
        case SV(s) =>
          tokenize(s).map(t => array_contains(textTokens(c), t))
            .reduceOption(_ && _).getOrElse(lit(true))
        // non-string values match as text of their rendering, like the
        // reference's MatchText(str(value)) (strategies.py:243-246) —
        // integral values render WITHOUT ".0" (str() of a JSON int)
        case NV(n) =>
          val rendered =
            if (n.isWhole && !n.isInfinity) n.toLong.toString else n.toString
          tokenize(rendered).map(t => array_contains(textTokens(c), t))
            .reduceOption(_ && _).getOrElse(lit(true))
        case other => throw new IllegalArgumentException(s"contains needs a scalar, got $other")
      }
      // engine extension: raw case-insensitive substring containment
      case "contains_substring" => f.value match {
        case SV(s) => lower(c).contains(lower(lit(s)))
        case other => throw new IllegalArgumentException(s"contains_substring needs a string, got $other")
      }
      case "any_of" => f.value match {
        case AV(vs) => c.isin(vs: _*)
        case other  => throw new IllegalArgumentException(s"any_of needs an array, got $other")
      }
      case op => throw new IllegalArgumentException(
        s"unknown operator '$op' (allowed: ${allowedOps.toSeq.sorted.mkString(", ")})")
    }
  }

  /** AND-combine a filter list (empty list → TRUE), reference F8. */
  def compileAll(fs: Seq[FilterSpec]): Column =
    fs.map(compile).reduceOption(_ && _).getOrElse(lit(true))
}
