package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, the single most recent right row at or
  * before the left row's time, matched within a key — the time-series
  * lookup ("what was the last X when Y happened") that relational engines
  * ship as a dedicated operator (DuckDB ASOF JOIN, kdb aj, Flink temporal
  * join). Spark has no built-in; the naive form (range join + argmax per
  * left row) is a quadratic nested-loop.
  *
  * Implemented with ZERO joins: union both sides tagged, ONE window pass
  * per key ordered by time, and a last-non-null carry-forward of the right
  * payload. One shuffle on the key, linear work, no row duplication — the
  * partition-by-key/sort-by-time shape that holds at any scale (and if the
  * store is bucketed by key, even that shuffle disappears).
  */
object AsofJoin {

  /** Left-outer as-of join (inclusive: rightTime <= leftTime wins).
    *
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tieBreak  right-side column breaking ties among right rows with
    *                  equal (keys, rightTime): the max wins — makes the
    *                  result deterministic, mirroring "latest version"
    * @param rightCols right-side columns to emit (must not collide with
    *                  left column names; alias beforehand)
    * @return every left row + `rightCols` of its as-of match (nulls if the
    *         key has no right row at or before leftTime)
    *
    * NULL semantics match DuckDB ASOF / the naive `rt <= lt` predicate:
    * a right row with a NULL key or NULL rightTime never matches anything
    * (dropped before the union — otherwise default nulls-first ordering
    * would carry its payload into every row of the key); a left row with a
    * NULL key or NULL leftTime is preserved with a NULL match (its _t
    * sorts before every right row, so nothing is carried into it).
    */
  def asofLe(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      rightCols: Seq[String]): DataFrame = {
    val restCols = rightCols.filterNot(Set(rightTime, tieBreak))
    // carried payload, ordered so that "last" = (max rightTime, max tieBreak)
    val payload = struct((Seq(col(rightTime).as("_rt"), col(tieBreak).as("_tb")) ++
      restCols.map(col)): _*)
    val payloadType = StructType(
      Seq(StructField("_rt", right.schema(rightTime).dataType),
        StructField("_tb", right.schema(tieBreak).dataType)) ++
        restCols.map(c => right.schema(c)))
    val leftStructType = StructType(left.schema.fields)

    val notNullRight = (keys :+ rightTime).map(col(_).isNotNull).reduce(_ && _)
    val r = right.where(notNullRight).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(1).as("_ir"),
        lit(null).cast(leftStructType).as("_l"),
        payload.as("_r")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        lit(0).as("_ir"),
        struct(left.columns.map(col): _*).as("_l"),
        lit(null).cast(payloadType).as("_r")): _*)

    // right rows sort BEFORE left rows at equal time (inclusive <=); among
    // equal-time right rows the struct order puts (max time, max tie) last
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_ir").desc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("_carry", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_ir") === 0)
    val outLeft = left.columns.map(c => col(s"_l.`$c`").as(c))
    val outRight = rightCols.map {
      case c if c == rightTime => col("_carry._rt").as(c)
      case c if c == tieBreak  => col("_carry._tb").as(c)
      case c                   => col(s"_carry.`$c`").as(c)
    }
    carried.select(outLeft ++ outRight: _*)
  }
}
