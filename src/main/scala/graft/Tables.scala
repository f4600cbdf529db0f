package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst predicate pushdown /
  * column pruning reach the file source. At 100 TB these directories would
  * be partitioned (e.g. orders by month, events by date); scans stay the
  * same — partition pruning is free once the layout exists.
  */
object Tables {
  private val ExcludedRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // InferFiltersFromGenerate clones a Generate's input expression into a
    // pre-filter BELOW the projection that materializes it — for our
    // shingle explodes that re-inlines an interpreted HOF as a per-row
    // filter (observed 10× slowdown). The rule is a pure optimization
    // (explode already skips empty arrays), so results are unchanged.
    // Merged into any exclusions the caller already set, not overwritten.
    val current = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    if (!current.contains(ExcludedRule))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        (current :+ ExcludedRule).mkString(","))
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events' `ts` column has shipped under two physical encodings so far:
    * nanosecond INT64 (which Spark only reads via `nanosAsLong`) and native
    * `timestamp[us]`. The reference parses event times tolerantly
    * (fegis strategies.py:192-194, formatters.py:113-121); this loader is
    * equally tolerant of the physical encoding — dispatch on the loaded
    * type instead of assuming one writer. Session TZ is UTC everywhere, so
    * the NTZ→LTZ cast is value-preserving and matches the DuckDB oracle's
    * naive view of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
