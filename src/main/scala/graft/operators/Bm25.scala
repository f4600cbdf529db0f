package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword ranking — the explicit form of the SPARSE half of the
  * reference's hybrid search (the reference's fastembed `query` ranks with
  * an opaque sparse BM25-family model alongside the dense embedding,
  * handler.py:52, strategies.py:263; SURVEY §4.3 names BM25 as the open
  * equivalent). Scoring a corpus against a literal query:
  *
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Physical shape at 100 TB:
  *  - corpus stats (N, Σ|d|) and per-term document frequencies are two
  *    combiner-heavy aggregations; df explodes DISTINCT tokens filtered to
  *    the query's terms (a literal in-list, so ≤|q| shuffle keys) and only
  *    |q| rows + 2 scalars ever reach the driver.
  *  - scoring is one explode → filter-to-query-terms → (doc, term) count →
  *    per-doc sum; shuffle keys are (doc, term) — uniform, no hot keys.
  *  - idf/avgdl ride into the scoring expression as literals.
  *
  * Determinism for cross-engine parity: idf is rounded to 6 digits, each
  * term contribution to 9, and the per-doc sum runs in DECIMAL (exact,
  * order-independent) — the same discipline as the engine's k-means/PQ
  * paths. In production the rounds can be dropped; they exist so two
  * engines summing in different orders agree bit-for-bit.
  */
object Bm25 {

  final case class Stats(n: Long, avgdl: Double, df: Map[String, Long])

  private def toks(c: Column): Column = TextFunctions.tokens(lower(c))

  /** Whitespace-tokenized, lowercased, deduped query terms. */
  def queryTerms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** One pass for (N, avgdl), one tiny aggregation for per-term df.
    *
    * The df collect below is bounded by `terms.size` rows (the aggregation
    * is filtered to the QUERY's terms before grouping) — that bound is what
    * makes it driver-safe. The same shape over a corpus-wide vocabulary
    * would collect millions of rows; never drop the `isin` filter. The
    * `require` pins the bound explicitly.
    */
  def corpusStats(docs: DataFrame, textCol: String,
      terms: Seq[String]): Stats = {
    require(terms.size <= 1024,
      s"corpusStats collects one df row per query term; ${terms.size} terms " +
        "exceeds the driver-safe bound (1024) — this API is for queries, " +
        "not corpus vocabularies (use TextAnalysis.vocabulary for those)")
    val base = docs.select(toks(col(textCol)).as("toks_"))
    val g = base.agg(count(lit(1)), sum(size(col("toks_")))).collect()(0)
    val n = g.getLong(0)
    // empty corpus (or all-null text): SUM aggregates to NULL — report
    // zero stats instead of an NPE; score() then yields no rows
    if (n == 0 || g.isNullAt(1)) return Stats(0L, 0.0, Map.empty)
    val df = base
      .select(explode(array_distinct(col("toks_"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Stats(n, g.getLong(1).toDouble / n, df)
  }

  /** Per-document BM25 scores for `query`; documents sharing no term with
    * the query are absent (score 0 by definition). Output: (idCol, score).
    */
  def score(docs: DataFrame, textCol: String, idCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val st = corpusStats(docs, textCol, terms)
    val idf: Map[String, Double] = terms.map { t =>
      val df = st.df.getOrElse(t, 0L).toDouble
      t -> BigDecimal(math.log(1.0 + (st.n - df + 0.5) / (df + 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val idfCol = terms.foldLeft(lit(0.0)) { (acc, t) =>
      when(col("term") === t, lit(idf(t))).otherwise(acc)
    }
    val tf = docs
      .select(col(idCol), toks(col(textCol)).as("toks_"))
      .withColumn("dl", size(col("toks_")))
      .select(col(idCol), col("dl"), explode(col("toks_")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    tf
      .withColumn("contrib_", round(
        idfCol * ((col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + (lit(b) * col("dl")) / lit(st.avgdl)))), 9))
      .groupBy(col(idCol))
      .agg(sum(col("contrib_").cast("decimal(28,12)")).cast("double").as("score"))
  }

  /** Top-k BM25 hits: TakeOrderedAndProject over [[score]]. */
  def topK(docs: DataFrame, textCol: String, idCol: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    score(docs, textCol, idCol, query, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
