package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional inverted index — the lexical
  * retrieval primitive BM25 (X45) cannot express: BM25 is a bag-of-terms
  * scorer, a phrase needs POSITIONS. The classical IR plan intersects k
  * posting lists with offset arithmetic; here the intersection is one
  * anchor-count aggregation instead of k−1 joins:
  *
  *   postings(term, doc, pos) ⋈broadcast phrase(idx, term)
  *     → (doc, anchor = pos − idx, idx)
  *   a phrase starts at `anchor` iff the (doc, anchor) group holds ALL
  *   k distinct idx values.
  *
  * A term repeated in the phrase ("the … the") contributes every idx it
  * matches; COUNT(DISTINCT idx) = k stays exactly right.
  *
  * Physical shape at 100 TB: the phrase table is k rows — broadcast by
  * construction — so the only shuffle is the (doc, anchor) aggregation,
  * and ONLY postings of the k phrase terms survive the broadcast join
  * (the index scan prunes to the query vocabulary, the posting-list
  * selectivity every IR engine relies on). With a pre-built index stored
  * term-bucketed, the scan prunes at the file level too.
  */
object PhraseSearch {

  /** Positional postings: (term, doc, pos), pos 0-based in token order —
    * the materialized-index shape (term-bucketed parquet at scale).
    */
  def positionalIndex(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col("term"), col("doc"), col("pos"))

  /** Documents containing the exact consecutive-token `phrase`:
    * (doc, n_matches, first_pos). Empty phrase is rejected.
    */
  def phraseMatches(docs: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 32,
      "phrase must be 1..32 tokens (the broadcast side)")
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrase.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("idx", "term")
    positionalIndex(docs, textCol, idCol)
      .join(broadcast(ph), "term")
      .select(col("doc"),
        (col("pos") - col("idx")).cast("long").as("anchor"), col("idx"))
      .groupBy(col("doc"), col("anchor"))
      .agg(countDistinct(col("idx")).as("n_idx"))
      .where(col("n_idx") === phrase.size)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }
}
