package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over integer durations with right
  * censoring — "how long does a user/document/shard survive before the
  * event, given that many are still alive when the window closes". The
  * churn/retention question `events_retention` answers per-cohort gets
  * the statistically-correct treatment here: censored subjects (still
  * active at window end) contribute risk-time without being counted as
  * deaths, which a naive "lifetime histogram" silently miscounts.
  *
  * Exactness contract (the oracle replays bit-for-bit):
  *   - the risk table is pure integer arithmetic: per distinct duration
  *     t, d_t events, c_t censorings, and n_t = subjects with duration
  *     ≥ t (one cumulative window over the ≤`maxBuckets` distinct
  *     times);
  *   - S(t) = Π_{t'≤t} (n_t' − d_t')/n_t' is carried in integer
  *     MICRO-UNITS (10^12 fixed point) with floor division per step —
  *     `s ← (s·(n−d)) div n` over BigInt — so the cumulative product is
  *     engine-identical (an external engine replays it with a recursive
  *     CTE in HUGEINT/BIGINT); the only float op in the output is ONE
  *     int→double conversion and ONE division per row;
  *   - deaths-before-censorings at equal times (the standard KM
  *     convention): censored-at-t subjects sit in the risk set for the
  *     deaths at t.
  *
  * Physical shape at 100 TB: durations are day-granular and horizon-
  * bounded by construction (a survival curve's resolution is a design
  * choice, not data-driven), so the distinct-time table is ≤`maxBuckets`
  * rows — the fold runs on the driver over model-size data, exactly the
  * PCA-power-iteration / centroid discipline ([[graft.operators]]
  * collect-bound inventory). Everything row-scale (per-subject duration,
  * the risk-table aggregation) stays distributed: one groupBy(subject),
  * one groupBy(duration), one window over distinct times.
  *
  * Reference anchor: the reference has no survival analysis; this
  * extends the events family (X-rows for retention/churn) with the
  * censoring-correct member.
  */
object Survival {

  /** 10^12 fixed-point scale for the survival product. */
  val Micro: Long = 1000000000000L

  /** KM curve from a per-subject table of (`durationCol`: integer
    * duration, `eventCol`: 1 = event observed, 0 = right-censored).
    * Output: (t, n_risk, d, c, surv_micro, survival) ordered by t —
    * one row per distinct duration present in the data.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
      maxBuckets: Int = 512): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byT = df
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("d"),
        sum(lit(1L) - col(eventCol).cast("long")).as("c"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT
      .withColumn("gone", coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .withColumn("total", sum(col("d") + col("c"))
        .over(Window.partitionBy()))
      .select(col("t"), (col("total") - col("gone")).as("n_risk"),
        col("d"), col("c"))
      .orderBy(col("t"))
    // driver fold over the bounded distinct-time table (model-size by
    // design: day-granular, horizon-bounded durations)
    val rows = risk.limit(maxBuckets + 1).collect()
    require(rows.length <= maxBuckets,
      s"kaplanMeier: > $maxBuckets distinct durations — bucket the " +
        "duration column (day/week granularity) before calling")
    var s = BigInt(Micro)
    val folded = rows.map { r =>
      val (t, n, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      s = s * BigInt(n - d) / BigInt(n) // n >= d+c >= 1 on present rows
      (t, n, d, c, s.toLong)
    }
    folded.toSeq.toDF("t", "n_risk", "d", "c", "surv_micro")
      .withColumn("survival",
        round(col("surv_micro").cast("double") / Micro.toDouble, 6))
      .orderBy(col("t"))
  }

  /** Per-group [[kaplanMeier]] — one survival curve per cohort/arm/
    * segment in a single pass. The risk tables build distributed
    * (groupBy (group, t) + one per-group window); the driver folds each
    * group's ≤`maxBuckets` rows independently (total driver rows bounded
    * by groups × buckets — still model-size for the cohort/segment
    * cardinalities this is for; a 10^6-group use belongs in the plain
    * per-key aggregation world, not curve estimation).
    *
    * Output: (group, t, n_risk, d, c, surv_micro, survival) ordered by
    * (group, t). */
  def kaplanMeierGrouped(df: DataFrame, groupCol: String,
      durationCol: String, eventCol: String,
      maxRows: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byT = df
      .groupBy(col(groupCol).cast("string").as("g"),
        col(durationCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("d"),
        sum(lit(1L) - col(eventCol).cast("long")).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT
      .withColumn("gone", coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .withColumn("total", sum(col("d") + col("c"))
        .over(Window.partitionBy(col("g"))))
      .select(col("g"), col("t"), (col("total") - col("gone")).as("n_risk"),
        col("d"), col("c"))
      .orderBy(col("g"), col("t"))
    val rows = risk.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"kaplanMeierGrouped: > $maxRows (group, duration) rows — coarsen " +
        "the duration grid or aggregate, don't curve-fit, this many groups")
    val folded = rows.toSeq
      .groupBy(_.getString(0)).toSeq
      .flatMap { case (g, rs) =>
        var s = BigInt(Micro)
        rs.sortBy(_.getLong(1)).map { r =>
          val (t, n, d, c) = (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4))
          s = s * BigInt(n - d) / BigInt(n)
          (g, t, n, d, c, s.toLong)
        }
      }
    folded.toDF("g", "t", "n_risk", "d", "c", "surv_micro")
      .withColumnRenamed("g", groupCol)
      .withColumn("survival",
        round(col("surv_micro").cast("double") / Micro.toDouble, 6))
      .orderBy(col(groupCol), col("t"))
  }

  /** [[kaplanMeier]] plus Greenwood 95% confidence bands. The Greenwood
    * cumulative Σ d/(n(n−d)) is carried in integer NANO units with floor
    * division per step (exact both engines); the band is then a short
    * chain of CORRECTLY-ROUNDED float ops — sqrt is IEEE-754
    * correctly-rounded (unlike libm ln/exp), so se = S·√(Σg) and
    * S ∓ z·se replay identically on any engine. d = n time points
    * (everyone at risk dies) have infinite Greenwood variance — bands
    * NULL there, survival itself unaffected.
    *
    * Output: (t, n_risk, d, c, surv_micro, g_nano, survival, lo, hi).
    */
  def kaplanMeierBands(df: DataFrame, durationCol: String, eventCol: String,
      maxBuckets: Int = 512, z: Double = 1.959964): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val risk = kaplanMeier(df, durationCol, eventCol, maxBuckets)
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        col("surv_micro"))
      .orderBy(col("t"))
      .collect()
    var g = BigInt(0)
    var gDead = false // once a d = n point passes, all later bands are null
    val folded = risk.map { r =>
      val (t, n, d, c, sm) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      if (n > d) g += BigInt(1000000000L) * d / (BigInt(n) * BigInt(n - d))
      else gDead = true
      (t, n, d, c, sm, if (gDead) None else Some(g.toLong))
    }
    folded.toSeq.toDF("t", "n_risk", "d", "c", "surv_micro", "g_nano")
      .withColumn("survival",
        round(col("surv_micro").cast("double") / Micro.toDouble, 6))
      .withColumn("se_", (col("surv_micro").cast("double") / Micro.toDouble)
        * sqrt(col("g_nano").cast("double") / 1000000000.0))
      // explicit null propagation: GREATEST/LEAST null-handling differs
      // by engine (most ignore nulls), so never let a null se reach them
      .withColumn("lo", when(col("g_nano").isNotNull,
        round(greatest(lit(0.0),
          (col("surv_micro").cast("double") / Micro.toDouble)
            - lit(z) * col("se_")), 6)))
      .withColumn("hi", when(col("g_nano").isNotNull,
        round(least(lit(1.0),
          (col("surv_micro").cast("double") / Micro.toDouble)
            + lit(z) * col("se_")), 6)))
      .drop("se_")
      .orderBy(col("t"))
  }

  /** Log-rank test: do two arms share a survival curve — the A/B read
    * on retention that respects censoring (comparing raw churn rates
    * biases toward whichever arm enrolled earlier). Mantel-Haenszel
    * form: at each pooled event time, observed arm-0 deaths vs the
    * hypergeometric expectation, χ² = (ΣO−E)²/ΣV against the 3.84
    * one-dof critical value.
    *
    * Exactness: every per-time term is integer floor-division in MILLI
    * fixed point — e1 = (1000·d·n1) div n; the variance factors
    * n1/n, n2/n, (n−d)/(n−1) each quantized to milli separately so no
    * product exceeds d·10^9 (BIGINT-safe at any per-time risk count
    * ≤ ~10^6; coarsen the duration grid first at larger cohorts, the
    * "coarsen, never scale up" PERF_NOTES discipline). Sums of integers
    * are exact; the χ² is ONE double multiply-divide chain at the end.
    * The quantization (~0.1% per factor) is part of the statistic's
    * definition here — deterministic on every engine beats a fourth
    * decimal of a test statistic.
    *
    * Input: per-subject (`durationCol`, `eventCol` 1=event/0=censored,
    * `armCol` 0/1). Output one row: (n1, n2, d1, d2, oe_milli, v_nano,
    * chi2, significant).
    *
    * Physical shape: one groupBy(duration) + one ordered window over the
    * ≤maxBuckets distinct times — all distributed; no driver fold needed
    * (unlike [[kaplanMeier]], the statistic is a plain sum).
    */
  def logRank(life: DataFrame, durationCol: String, eventCol: String,
      armCol: String): DataFrame = {
    val byT = life
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(when(col(armCol) === 0, col(eventCol).cast("long"))
          .otherwise(0L)).as("d1"),
        sum(when(col(armCol) === 0, lit(1L) - col(eventCol).cast("long"))
          .otherwise(0L)).as("c1"),
        sum(when(col(armCol) === 1, col(eventCol).cast("long"))
          .otherwise(0L)).as("d2"),
        sum(when(col(armCol) === 1, lit(1L) - col(eventCol).cast("long"))
          .otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val risk = byT
      .withColumn("tot1", sum(col("d1") + col("c1")).over(all))
      .withColumn("tot2", sum(col("d2") + col("c2")).over(all))
      .withColumn("n1", col("tot1") -
        coalesce(sum(col("d1") + col("c1")).over(w), lit(0L)))
      .withColumn("n2", col("tot2") -
        coalesce(sum(col("d2") + col("c2")).over(w), lit(0L)))
      .where(col("d1") + col("d2") > 0)
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("e1m", expr("(1000 * d * n1) div n"))
      .withColumn("oem", lit(1000L) * col("d1") - col("e1m"))
      .withColumn("am", expr("(1000 * n1) div n"))
      .withColumn("bm", expr("(1000 * n2) div n"))
      .withColumn("cm", when(col("n") > 1,
        expr("(1000 * (n - d)) div (n - 1)")).otherwise(lit(0L)))
      .withColumn("v9", col("d") * col("am") * col("bm") * col("cm"))
    risk.agg(
        max(col("tot1")).as("n1"), max(col("tot2")).as("n2"),
        sum(col("d1")).as("d1"), sum(col("d2")).as("d2"),
        sum(col("oem")).as("oe_milli"), sum(col("v9")).as("v_nano"))
      .select(col("n1"), col("n2"), col("d1"), col("d2"),
        col("oe_milli"), col("v_nano"),
        when(col("v_nano") > 0,
          // square in DOUBLE, not Long: oe_milli beyond ~3e9 (|O−E| over
          // ~3e6 deaths) silently wraps a BIGINT square in Spark where
          // the oracle's BIGINT multiply raises — the double square is
          // exact below 2^53 and correctly rounded above, never wrong-sign
          round(col("oe_milli").cast("double") *
            col("oe_milli").cast("double") *
            lit(1000.0) / col("v_nano").cast("double"), 6))
          .as("chi2"))
      .withColumn("significant",
        coalesce(col("chi2") > 3.841459, lit(false)))
  }

  /** Per-subject lifetime table from an event log: duration = days
    * between first and last event; the event (churn) is OBSERVED iff the
    * last event predates `cutoff` (subjects active after it are
    * right-censored — still alive when the window closed). Output:
    * (subject, dur, ev). */
  def lifetimes(events: DataFrame, subjectCol: String, tsCol: String,
      cutoff: Column): DataFrame =
    events
      .groupBy(col(subjectCol).as("subject"))
      .agg(min(to_date(col(tsCol))).as("first_d"),
        max(to_date(col(tsCol))).as("last_d"))
      .select(col("subject"),
        datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(col("last_d") < cutoff, 1L).otherwise(0L).as("ev"))
}
