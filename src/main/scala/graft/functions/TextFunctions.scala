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

  /** Content preview — a field-exact port of the reference's
    * `format_content_preview` + `extract_summary(max_sentences=2)`
    * (formatters.py:172-218):
    *
    *  1. whitespace-normalize (`" ".join(content.split())`);
    *  2. if the normalized text fits in `maxLen`, return it;
    *  3. else build the summary: split on `[.!?]+` runs (fragments do NOT
    *     need a terminator — a trailing unterminated fragment counts),
    *     trim, drop empties, take the first TWO, join with ". " and append
    *     "." (the fragments carry no terminators, so the reference's
    *     "append if missing" always fires);
    *  4. no fragments at all (text is only terminators): the
    *     `extract_summary` fallback — the raw text if ≤ 100 chars, else
    *     its first 97 + "...";
    *  5. summary within `maxLen` → summary; else the SUMMARY (not the raw
    *     text) hard-cut at `maxLen - 3` + "...".
    *
    * Pure Column tree (split/slice/array_join — no fold), RE2-safe regex.
    */
  def contentPreview(content: Column, maxLen: Int = 150): Column = {
    val norm = coalesce(normalizeWhitespace(content), lit(""))
    val sentences = filter(
      transform(split(norm, "[.!?]+"), s => trim(s)), s => length(s) > 0)
    // extract_summary: 2-fragment summary, or the raw-text fallback when
    // the text is nothing but terminators
    val summary = when(size(sentences) === 0,
      when(length(norm) <= 100, norm)
        .otherwise(concat(substring(norm, 1, 97), lit("..."))))
      .otherwise(concat(array_join(slice(sentences, 1, 2), ". "), lit(".")))
    // the final cap applies to WHATEVER extract_summary returned —
    // including the fallback (matters when maxLen < ~103)
    when(length(norm) <= maxLen, norm)
      .when(length(summary) <= maxLen, summary)
      .otherwise(concat(substring(summary, 1, maxLen - 3), lit("...")))
  }

  /** Relative-time bucketing (reference: formatters.py:141-169): render the
    * age of `ts` relative to `now` as "just now" / "N minutes ago" /
    * "N hours ago" / "N days ago" / "N weeks ago" / "N months ago",
    * singular when N = 1 exactly as the reference pluralizes. `now` is a
    * parameter (not current_timestamp()) so results are deterministic and
    * oracle-checkable.
    *
    * Ported faithfully INCLUDING Python timedelta normalization: a
    * negative difference (future `ts`) carries days = floor(secs/86400)
    * and a non-negative seconds remainder, so the reference reports a
    * future timestamp through the hours/minutes branches of the
    * remainder ("23 hours ago" for now+30s), never "just now" — floor
    * division + pmod reproduce that here (spec-checked vs a literal
    * port).
    */
  def relativeTime(ts: Column, now: Column): Column = {
    val secs = unix_timestamp(now) - unix_timestamp(ts)
    // timedelta(seconds=secs): days = floor-div, remainder in [0, 86400)
    val days = floor(secs / 86400)
    val rem = pmod(secs, lit(86400))
    val hours = floor(rem / 3600)
    val mins = floor(pmod(rem, lit(3600)) / 60)
    val weeks = floor(days / 7)
    val months = floor(days / 30)
    def ago(n: Column, unit: String): Column =
      concat(n.cast("string"),
        when(n === 1, lit(s" $unit ago")).otherwise(lit(s" ${unit}s ago")))
    when(days > 0,
      when(days < 7, ago(days, "day"))
        .when(days < 30, ago(weeks, "week"))
        .otherwise(ago(months, "month")))
      .otherwise(
        when(hours > 0, ago(hours, "hour"))
          .when(mins > 0, ago(mins, "minute"))
          .otherwise(lit("just now")))
  }

  /** Word tokens: split on whitespace, drop empties. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** DataFrame-level content preview: stages norm/sentences/summary as
    * materialized columns so each regexp/HOF pass runs once per row (the
    * single-Column [[contentPreview]] re-evaluates `norm` at every
    * reference because the HOF parts are interpreted without CSE). Same
    * ported semantics as [[contentPreview]].
    */
  def withContentPreview(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String, maxLen: Int = 150): org.apache.spark.sql.DataFrame = {
    df
      .withColumn("norm_", coalesce(normalizeWhitespace(col(textCol)), lit("")))
      .withColumn("sentences_",
        filter(transform(split(col("norm_"), "[.!?]+"), s => trim(s)),
          s => length(s) > 0))
      .withColumn("summary_",
        when(size(col("sentences_")) === 0,
          when(length(col("norm_")) <= 100, col("norm_"))
            .otherwise(concat(substring(col("norm_"), 1, 97), lit("..."))))
          .otherwise(concat(array_join(slice(col("sentences_"), 1, 2), ". "), lit("."))))
      .withColumn(outCol,
        when(length(col("norm_")) <= maxLen, col("norm_"))
          .when(length(col("summary_")) <= maxLen, col("summary_"))
          .otherwise(concat(substring(col("summary_"), 1, maxLen - 3), lit("..."))))
      .drop("norm_", "sentences_", "summary_")
  }

  /** `textwrap.shorten` twin (reference log_viewer.py:25-30 `_pretty`):
    * whitespace-normalize; if longer than `width`, keep the longest
    * CONTIGUOUS whole-word prefix that fits in `width - len(placeholder)`
    * and append the placeholder; if not even the first word fits, the
    * placeholder alone.
    *
    * Greedy-prefix contiguity is load-bearing: after a long word stops
    * the prefix, a later shorter word must NOT be glued on — so the
    * prefix is found as max{i : len(join(words[0..i])) ≤ budget}, which
    * equals textwrap's fill-then-drop-words rule. Staged columns keep the
    * interpreted HOFs from re-evaluating the token array per element.
    */
  def withShortened(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String, width: Int = 80,
      placeholder: String = "…"): org.apache.spark.sql.DataFrame = {
    require(width > placeholder.length)
    val budget = width - placeholder.length
    df
      .withColumn("norm_", coalesce(normalizeWhitespace(col(textCol)), lit("")))
      .withColumn("toks_", tokens(col("norm_")))
      .withColumn("keep_", array_max(transform(
        sequence(lit(1), size(col("toks_"))),
        i => when(length(array_join(slice(col("toks_"), lit(1), i), " ")) <= budget, i)
          .otherwise(lit(0)))))
      .withColumn(outCol,
        when(length(col("norm_")) <= width, col("norm_"))
          .when(coalesce(col("keep_"), lit(0)) > 0,
            concat(array_join(slice(col("toks_"), lit(1), col("keep_")), " "),
              lit(placeholder)))
          .otherwise(lit(placeholder)))
      .drop("norm_", "toks_", "keep_")
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

  /** Simplified-Soundex phonetic block key — the third ER blocking
    * family (after hash/prefix and sorted-neighborhood): first retained
    * letter + the first three consonant-class digits, so variant
    * spellings that SOUND alike co-block ("Smith"/"Smyth" → S53).
    * A pure Column tree both engines express identically:
    * letters-only uppercase → 1:1 `translate` to class digits
    * (vowels+HWY→0, BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6) → runs
    * of the same digit collapsed by seven chained `regexp_replace`
    * rules (RE2-safe: no backreferences — DuckDB's regexp engine has
    * none) → zeros dropped → first 3, zero-padded. Simplification vs
    * classic Soundex: the first letter's own class is not deduplicated
    * against the following code, and H/W separators reset runs —
    * consistent on both engines, which is what a block key needs.
    * Empty / letterless input → "000".
    */
  def phoneticKey(name: Column): Column = {
    val up = upper(regexp_replace(name, "[^A-Za-z]", ""))
    val coded = translate(substring(up, 2, 1000000),
      "AEIOUYHWBFPVCGJKQSXZDTLMNR",
      "00000000111122222222334556")
    val collapsed = (0 to 6).foldLeft(coded)((e, d) =>
      regexp_replace(e, s"$d+", d.toString))
    concat(substring(up, 1, 1),
      rpad(substring(regexp_replace(collapsed, "0", ""), 1, 3), 3, "0"))
  }
}
