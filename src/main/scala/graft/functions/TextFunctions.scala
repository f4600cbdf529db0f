package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/date functions matching the reference's formatter semantics
  * (reference: fegis/search/formatters.py). All pure Column expressions —
  * codegen-friendly, no UDFs.
  */
object TextFunctions {

  /** Collapse runs of whitespace to single spaces and trim
    * (reference: formatters.py:204). */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Content preview (reference: formatters.py:172-218): whitespace-normalize,
    * and if longer than `maxLen` chars truncate sentence-aware — keep whole
    * sentences while they fit in `maxLen - 3`, else hard-cut at
    * `maxLen - 3` — and append "...".
    *
    * Implemented as a Column tree: sentence split on [.!?]+ then a bounded
    * fold that re-assembles the longest fitting prefix.
    */
  def contentPreview(content: Column, maxLen: Int = 150): Column = {
    val norm = normalizeWhitespace(content)
    val budget = maxLen - 3
    // Longest prefix of whole sentences (with their terminators) <= budget;
    // fall back to a hard cut. Sentence extraction uses an RE2-safe pattern
    // (no lookbehind) so the semantics are reproducible in external SQL
    // oracles: a sentence is a maximal run ending in [.!?]+; a trailing
    // fragment without a terminator is not a whole sentence.
    val sentences = transform(
      regexp_extract_all(norm, lit("[^.!?]+[.!?]+"), lit(0)), s => trim(s))
    val prefix = aggregate(
      sentences,
      lit(""),
      (acc, s) =>
        when(length(acc) === 0 && length(s) <= budget, s)
          .when(length(acc) + 1 + length(s) <= budget, concat(acc, lit(" "), s))
          .otherwise(acc))
    when(length(norm) <= maxLen, norm)
      .when(length(prefix) > 0, concat(prefix, lit("...")))
      .otherwise(concat(substring(norm, 1, budget), lit("...")))
  }

  /** Relative-time bucketing (reference: formatters.py:141-169): render the
    * age of `ts` relative to `now` as "just now" / "N minutes ago" /
    * "N hours ago" / "N days ago" / "N weeks ago" / "N months ago",
    * singular when N = 1 ("1 day ago", "1 week ago", ...) exactly as the
    * reference pluralizes. `now` is a parameter (not current_timestamp())
    * so results are deterministic and oracle-checkable.
    */
  def relativeTime(ts: Column, now: Column): Column = {
    val secs = unix_timestamp(now) - unix_timestamp(ts)
    val mins = floor(secs / 60)
    val hours = floor(secs / 3600)
    val days = floor(secs / 86400)
    val weeks = floor(days / 7)
    val months = floor(days / 30)
    def ago(n: Column, unit: String): Column =
      concat(n.cast("string"),
        when(n === 1, lit(s" $unit ago")).otherwise(lit(s" ${unit}s ago")))
    when(secs < 60, lit("just now"))
      .when(mins < 60, ago(mins, "minute"))
      .when(hours < 24, ago(hours, "hour"))
      .when(days < 7, ago(days, "day"))
      .when(days < 30, ago(weeks, "week"))
      .otherwise(ago(months, "month"))
  }

  /** Word tokens: split on whitespace, drop empties. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** DataFrame-level content preview: stages norm/sentences/prefix as
    * materialized columns so each regexp pass runs once per row (the
    * single-Column [[contentPreview]] re-evaluates `norm` at every
    * reference because the HOF parts are interpreted without CSE).
    */
  def withContentPreview(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String, maxLen: Int = 150): org.apache.spark.sql.DataFrame = {
    val budget = maxLen - 3
    df
      .withColumn("norm_", normalizeWhitespace(col(textCol)))
      .withColumn("sentences_",
        transform(regexp_extract_all(col("norm_"), lit("[^.!?]+[.!?]+"), lit(0)),
          s => trim(s)))
      .withColumn("prefix_", aggregate(
        col("sentences_"), lit(""),
        (acc, s) =>
          when(length(acc) === 0 && length(s) <= budget, s)
            .when(length(acc) + 1 + length(s) <= budget, concat(acc, lit(" "), s))
            .otherwise(acc)))
      .withColumn(outCol,
        when(length(col("norm_")) <= maxLen, col("norm_"))
          .when(length(col("prefix_")) > 0, concat(col("prefix_"), lit("...")))
          .otherwise(concat(substring(col("norm_"), 1, budget), lit("..."))))
      .drop("norm_", "sentences_", "prefix_")
  }

  /** BPE-ish subword-ish token count: word chunks, numbers, and single
    * punctuation marks each count as one token (a cheap stand-in for a real
    * tokenizer with the same asymptotics).
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word k-shingles from an already-materialized token-array COLUMN.
    *
    * The tokens must be a real attribute (a withColumn output), not an
    * inline expression: a lambda body re-evaluates any captured outer
    * EXPRESSION once per element (HOFs are interpreted, no CSE), which
    * turns shingling into O(tokens²) re-tokenization. Against an
    * attribute, each element_at is an O(1) row read.
    */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))

  /** Word k-shingles of the whitespace token stream, e.g. k=3 →
    * ["a b c", "b c d", ...]. Empty array when fewer than k tokens.
    * Convenience form for small inputs — operators on large data should
    * stage the token column and use [[shinglesFromTokens]].
    */
  def wordShingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(text), k)
}
