package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k via a typed [[Aggregator]] with a bounded buffer.
  *
  * The window form (`row_number over (partition by g order by v) <= k`)
  * sorts EVERY group's full row set; this aggregator keeps only k
  * candidates per group in the aggregation buffer, so partial (map-side)
  * aggregation shrinks data before the shuffle — the right physical shape
  * when groups are large and k is small (top-k docs per domain over
  * 100 TB). Results are identical to the window form for distinct
  * (value, id) rankings.
  */
object TopK {

  type Entry = (Double, Long) // (sort value desc, tie-break id asc)

  /** Bounded top-k buffer: descending by value, ascending id on ties.
    * Input rows are (group, value, id); the group key is handled by
    * groupByKey outside. */
  class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double, Long), List[Entry], Seq[Entry]] {
    private def ord: Ordering[Entry] =
      Ordering.by[Entry, (Double, Long)] { case (v, id) => (-v, id) }
    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], row: (Long, Double, Long)): List[Entry] =
      ((row._2, row._3) :: buf).sorted(ord).take(k)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      (a ++ b).sorted(ord).take(k)
    override def finish(buf: List[Entry]): Seq[Entry] = buf
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** 2-D skyline (Pareto frontier): rows not STRICTLY dominated under
    * (minimize `minCol`, maximize `maxCol`) — the "cheapest part at
    * every size class" / "best cost-quality trade" query. Strict
    * dominance: b dominates a iff b.min ≤ a.min ∧ b.max ≥ a.max with at
    * least one strict; coincident points tie and ALL survive.
    *
    * Shape: the textbook NOT EXISTS is an O(n²) self-join (the oracle
    * runs exactly that); here it collapses to the classic sweep — per
    * distinct min-value the max of maxCol, a running max over STRICTLY
    * smaller min-values (one lag on the ordered distinct-value series,
    * which is what the window sort pays — value-cardinality, not rows),
    * then one semi-join back: a row survives iff its maxCol equals its
    * class best AND beats every cheaper class. O(n log n) where the
    * dominance join is quadratic — the difference between a skyline
    * over 10^9 offers and not running it.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = df.groupBy(col(minCol).as("mn_"))
      .agg(max(col(maxCol)).as("best_"))
      .withColumn("before_", max(col("best_")).over(
        Window.orderBy(col("mn_"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .where(col("before_").isNull || col("best_") > col("before_"))
      .select(col("mn_"), col("best_"))
    df.join(best, df(minCol) === col("mn_") && df(maxCol) === col("best_"))
      .drop("mn_", "best_")
  }

  /** Top-k rows per group: returns (group, id, value, rank). */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long").as("g"),
        col(valueCol).cast("double").as("v"), col(idCol).cast("long").as("i"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .toDF("g", "topk")
      .select(col("g"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("g").as(groupCol), col("e._2").as(idCol),
        col("e._1").as(valueCol), (col("pos") + 1).cast("int").as("rank"))
  }
}
