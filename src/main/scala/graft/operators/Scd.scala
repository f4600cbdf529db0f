package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse side of the
  * engine's store: turning an update/event stream into SCD Type-2
  * validity intervals, and diffing two snapshots of a table into the
  * added/removed/changed changelog that incremental pipelines consume.
  * (The reference's store keeps only latest-state points; these operators
  * are the standard batch-warehouse extension of that model.)
  */
object Scd {

  /** SCD Type-2 build from an ordered change stream: one output row per
    * (key, state version) with `valid_from`/`valid_to` interval bounds
    * and `is_current`. Consecutive updates carrying an IDENTICAL state
    * collapse into one version (null-safe struct compare), so the output
    * is the minimal interval history.
    *
    * Ordering within a key is (tsCol, tieCol) — the tie column (a unique
    * event id) makes the history deterministic under same-timestamp
    * updates on any engine and any partitioning.
    *
    * Physical shape at 100 TB: everything is per-key windows over ONE
    * hash partitioning on the key — Spark plans a single Exchange on
    * keyCol and runs lag/flag/version-sum/lead in consecutive window
    * operators over the same sort, no joins, no second shuffle. State is
    * one row lookback/lookahead; nothing driver-side. Skewed keys (one
    * entity with millions of updates) sort within their partition —
    * spillable, not OOM-bound.
    */
  def buildScd2(updates: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val state = struct(stateCols.map(col): _*)
    // first row per key: lag is NULL and a struct is never NULL, so the
    // null-safe compare comes back false → flagged as a change
    val flagged = updates
      .withColumn("chg_",
        when(!(state <=> lag(state, 1).over(byKey)), lit(1)).otherwise(lit(0)))
    val versions = flagged
      .where(col("chg_") === 1)
      .withColumn("version", row_number().over(byKey))
      .withColumn("valid_from_", col(tsCol))
      .withColumn("valid_to_", lead(col(tsCol), 1).over(byKey))
    versions.select(
      Seq(col(keyCol)) ++ stateCols.map(col) ++ Seq(
        col("version"),
        date_format(col("valid_from_"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_").isNull.as("is_current")): _*)
  }

  /** Incremental SCD2 maintenance: fold a NEW batch of updates into an
    * existing [[buildScd2]] table without rebuilding history — the daily
    * dimension-refresh shape (at 100 TB the closed history is immutable
    * cold data; only current rows and the new batch move).
    *
    * Closed versions pass through untouched. Each key's current row is
    * replayed as a synthetic first update (its valid_from, a tie below
    * every real id) and re-chained with the new batch through the same
    * [[buildScd2]]; versions renumber with the key's closed-row offset.
    * Result is row-identical to `buildScd2(fullHistory)` — gated exactly
    * that way — provided updates arrive after the key's current
    * valid_from (late-arriving rewrites need the rebuild path).
    *
    * Physical shape: one filter pass over the existing table, the
    * rebuild's single key-partitioned window over (current ∪ batch) —
    * per-key input is 1 + batch rows, NOT history — and one broadcast-
    * sized offset join.
    */
  def applyScd2(existing: DataFrame, updates: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, stateCols: Seq[String]): DataFrame = {
    // the synthetic replay row needs a tie value BELOW every real one, and
    // injects Long.MinValue — meaningless for a non-numeric tie column
    // (the cast would silently null out every real tie and the fold would
    // diverge from the rebuild). buildScd2 itself accepts any ordered
    // type; only the incremental path carries this restriction.
    require(updates.schema(tieCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"applyScd2: tie column '$tieCol' must be numeric (got " +
        s"${updates.schema(tieCol).dataType.simpleString}); use buildScd2 for non-numeric ties")
    val closed = existing.where(!col("is_current"))
    val offsets = existing.groupBy(col(keyCol))
      .agg((max(col("version")) - 1).as("voff_"))
    val synth = existing.where(col("is_current"))
      .select(Seq(col(keyCol),
        to_timestamp(col("valid_from")).as(tsCol),
        lit(Long.MinValue).as(tieCol)) ++ stateCols.map(col): _*)
    val batch = updates.select(Seq(col(keyCol), col(tsCol),
      col(tieCol).cast("long").as(tieCol)) ++ stateCols.map(col): _*)
    val rebuilt = buildScd2(synth.unionByName(batch),
      keyCol, tsCol, tieCol, stateCols)
    val bumped = rebuilt.join(offsets, Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("voff_"), lit(0)))
      .drop("voff_")
    closed.unionByName(bumped)
  }

  /** Snapshot diff: the added/removed/changed changelog between two
    * versions of a table sharing a schema. `changed` means any non-key
    * column differs under null-safe compare — compared COLUMN-WISE, never
    * through a serialized-string hash, so double/decimal/timestamp
    * formatting differences between engines can't fake a change.
    * Unchanged rows are dropped (the changelog, not a full outer copy).
    *
    * Physical shape: one full-outer sort-merge join on the key (the only
    * shuffle, AQE-skew-splittable), per-row status expression, filter.
    * At 100 TB both sides prune to key+compared columns at the scan.
    */
  /** CDC apply — the MERGE primitive: fold an insert/update/delete
    * changelog into final state. Per key, the HIGHEST-sequence row wins
    * (one key-partitioned window, the same shuffle as any last-per-key);
    * a winning delete removes the key entirely. This is the
    * batch-replay form of what Delta/Iceberg MERGE INTO executes — at
    * 100 TB the changelog partition-prunes against the base exactly as
    * [[graft.sink.StoreLayout.deleteKeys]] does for the delete-only
    * case; here the semantics are pinned engine-exactly for the full
    * I/U/D alphabet.
    *
    * `seqCols` break ties in order (e.g. ts, then event id — a total
    * order makes the fold deterministic under any partitioning).
    * Output: the non-deleted winning rows, original payload columns.
    */
  def cdcApply(changelog: DataFrame, keyCol: String, seqCols: Seq[String],
      opCol: String): DataFrame =
    cdcWinners(changelog, keyCol, seqCols)
      .where(col(opCol) =!= "D")

  /** The fold kernel under [[cdcApply]]: highest-sequence row per key,
    * DELETES RETAINED as tombstones. Argmax over a total order is
    * associative — winners(winners(A) ∪ winners(B)) = winners(A ∪ B) —
    * which is exactly what lets a streaming fold keep only winner rows
    * per key as its whole state; and tombstones are WHY the state must
    * keep deletes: drop them and a late lower-sequence update wrongly
    * resurrects the key. Read time applies the `op ≠ D` filter.
    */
  def cdcWinners(changelog: DataFrame, keyCol: String,
      seqCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "a total sequence order is the determinism contract")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(seqCols.map(c => col(c).desc): _*)
    changelog
      .withColumn("rn_", row_number().over(w))
      .where(col("rn_") === 1)
      .drop("rn_")
  }

  def diffSnapshots(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    val compareCols = before.columns.filterNot(keyCols.contains).toSeq
    require(compareCols.nonEmpty, "diffSnapshots: no non-key columns")
    val a = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("present_a_", lit(1))
    val b = after.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("present_b_", lit(1))
    val renamedB = compareCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val joined = a.join(renamedB, keyCols, "full_outer")
    val anyChanged = compareCols
      .map(c => !(col(c) <=> col(s"b_$c")))
      .reduce(_ || _)
    joined
      .withColumn("status",
        when(col("present_a_").isNull, lit("added"))
          .when(col("present_b_").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
