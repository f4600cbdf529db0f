package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Queries materialize through the noop sink — unlike count(), noop
  * evaluates every projected expression (embeddings, hashes, previews)
  * and keeps sorts, so timings reflect real work. A flagship warm-up run
  * pays JIT/codegen compilation once, outside the measured loop.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Gate-scale streaming partition pins (r12 measurements: staged
      // stateful gates at p4, frequent-pairs fold at p8). The harness owns
      // these numbers; the operators read the conf and run with the
      // session's own sizing when it is unset (production).
      .config("graft.stream.parts",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
      .config("graft.stream.parts.fp",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS_FP", "8"))
      .config("graft.stream.parts.ivj",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS_IVJ", "2"))
      // Incremental changelog per commit instead of a full RocksDB
      // snapshot — the recommended production mode for RocksDB state
      // stores, and measured ~5-9% off the heavier TWS gates here
      // (AbConfR13, r13): stream_tws_sessions 4.39 -> 4.00 s,
      // stream_tws_asof 3.47 -> 3.26 s, others flat.
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: bench output is the one JSON line; expected-at-this-scale
    // warnings (e.g. bounded-candidate-set windows) otherwise drown it
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JIT/codegen warm-up (not measured): run EVERY query once at the
    // smallest SF so each query's generated code is compiled before its
    // measured run — first execution otherwise pays 1-6s of Janino+JIT.
    // Budget-capped so a noisy host can't eat the whole bench window.
    val warmupDeadline = System.nanoTime() + 120L * 1000000000L
    SparkEntry.queries.foreach { case (_, fn) =>
      if (System.nanoTime() < warmupDeadline) {
        try materialize(fn(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // Measured pass + selective re-measurement: this host shows
    // multi-second noisy-neighbor stalls that land on random queries, so
    // any query whose first measurement looks slow is re-run (deadline-
    // bounded) and the minimum is reported — the min of time-separated
    // runs estimates true cost far better than one sample under noise.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // (elapsed, ok) — a query that throws must NOT pass off its
    // elapsed-to-failure time as a fast success: failures are reported as
    // the sentinel -1 plus a "failed" list, and excluded from the total.
    def timeOne(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release every cache entry the gate persisted, OUTSIDE the timed
      // region: several gates `.persist()` a reused intermediate and
      // cannot unpersist it themselves (the action runs here, not in the
      // lambda). Without this (a) cached intermediates accumulate across
      // 400+ gates in the one bench JVM, and (b) CacheManager dedupes
      // identical plans, so a gate's SECOND sample silently reused the
      // first sample's cache — the reported min partially measured a
      // cache hit. Both samples now compute from the parquet inputs.
      spark.sharedState.cacheManager.clearCache()
      (dt, ok)
    }
    val p1 = names.map { case (n, fn) => n -> timeOne(n, fn) }
    // 540s: the 240s budget left 90+ of the ~180 queries with a single
    // (cold) sample in round 7; 420s still cut 21 of 387 in round 10
    // (pass 1 alone runs ~419s at sf0.1). Single-sample queries can't
    // flag regressions, so the rerun deadline should cover the suite.
    val deadline = System.nanoTime() + 540L * 1000000000L
    // Re-measure EVERY successful query, slowest first: a 0.4 s query
    // stalled to 1.7 s by a noisy neighbor previously escaped the old
    // t > 2.0 re-run band and read as a 4x regression. Descending order
    // means the noise-susceptible expensive queries re-run before the
    // deadline can cut the pass short; the sub-second tail is cheap.
    val rerun = p1.collect { case (n, (t, true)) => n -> t }
      .sortBy(-_._2)
      .flatMap { case (n, t) =>
        if (System.nanoTime() < deadline) {
          val (t2, ok2) = timeOne(n, SparkEntry.queries(n))
          if (ok2) Some(n -> t2) else None
        } else None
      }.toMap
    val results = p1.map { case (n, (t, ok)) =>
      n -> (rerun.get(n).fold(t)(math.min(t, _)), ok)
    }
    val qs = results.map { case (k, (v, ok)) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    // Both raw measurements per query ([pass1, pass2]; one element when
    // the rerun deadline cut the second pass): `queries` keeps the min —
    // the best noise-free estimate — while `samples` exposes the spread,
    // so a round-over-round delta under the host's ~30% ambient variance
    // can be judged against the per-query spread instead of guessed at.
    val samples = p1.collect { case (n, (t, true)) =>
      "\"" + n + "\":[" + (Seq(t) ++ rerun.get(n)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, (v, true)) => v }.sum
    // Regression flagging vs the previous committed artifact: each query's
    // warm time (min of the two samples — the noise-free estimate) against
    // the same field in the prior round's bench_full.json. 1.4x on warm is
    // above this host's documented ~30% ambient variance, so anything
    // flagged is a real plan/code regression, not noise — the automated
    // replacement for the judge's round-over-round delta analysis.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "bench_full.json")
    val prev: Map[String, Double] =
      try {
        val txt = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prevPath)), "UTF-8")
        val qseg = txt.substring(txt.indexOf("\"queries\":{") + 10)
        val obj = qseg.substring(0, qseg.indexOf("}") + 1)
        "\"([^\"]+)\":(-?[0-9][0-9.eE+-]*)".r.findAllMatchIn(obj)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    // Only queries with >=2 samples this run may flag: a single sample is a
    // cold-run time, and cold-vs-warm ratios flagged 40+ phantom
    // "regressions" in round 7 when the rerun deadline cut the second pass.
    // Single-sample queries are counted (single_sample) so a truncated run
    // is visibly weaker evidence, not silently complete.
    // Micro-gates (prev < 1 s) need a 3.0x ratio to flag: sub-second
    // queries drift 2-3x on identical code on this host (round-9
    // same-code example: events_odds_ratio 0.61 -> 2.04 s), so a 1.4x
    // bar on them only manufactures noise for the A/B pass to clear.
    // A genuine micro-gate regression big enough to matter (0.3 s -> 30 s)
    // still clears 3.0x.
    val flagged = results.toSeq
      .collect { case (n, (cur, true)) if rerun.contains(n) =>
        prev.get(n).collect {
          case p if p > 0 && cur / p >= (if (p >= 1.0) 1.4 else 3.0) =>
            (n, p, cur, cur / p)
        }
      }.flatten.sortBy(-_._4)
    // Interleaved A/B on every flagged query (ProbeMemSearch pattern,
    // in-JVM alternation with a stable baseline): host drift hits the
    // baseline and the flagged query alike, a plan regression only the
    // flagged query. Verdict ships IN the artifact: "cleared" (more
    // samples pulled the min under the 1.4x flag bar — the flag was
    // noise), "drift" (baseline-normalized ratio <= 1.15 — host, not
    // plan) or "plan_suspect" (survives normalization — look at the
    // plan). Deadline-bounded like every other pass.
    val abBase = "q1_pricing_summary"
    val abDeadline = System.nanoTime() + 120L * 1000000000L
    val abBasePrev = prev.get(abBase).filter(_ > 0)
    val regressions = flagged
      .map { case (n, p, c, r) =>
        var bestQ = c
        var bestB = Double.MaxValue
        var round = 0
        while (round < 3 && System.nanoTime() < abDeadline) {
          val (bt, bok) = timeOne(abBase, SparkEntry.queries(abBase))
          if (bok) bestB = math.min(bestB, bt)
          val (qt, qok) = timeOne(n, SparkEntry.queries(n))
          if (qok) bestQ = math.min(bestQ, qt)
          round += 1
        }
        val hostFactor = abBasePrev
          .filter(_ => bestB < Double.MaxValue).map(bestB / _)
        val normRatio = hostFactor.map(h => (bestQ / p) / h)
          .getOrElse(bestQ / p)
        // "plan_suspect" must be EARNED by A/B evidence: if the deadline
        // cut the loop before any alternation ran (round == 0, bestQ
        // still the flagging sample), the honest verdict is
        // "unadjudicated" — round-9 emitted 10 plan_suspects whose
        // ab_min == cur, i.e. zero new samples behind the accusation.
        // Clearing bar matches the flag bar per-gate: sub-second gates
        // flag only at >=3.0x (ambient same-code drift is 2-3x), so a
        // sub-second A/B min settling at e.g. 1.8x is cleared, not
        // escalated — a flat 1.4x bar would re-admit the noise class
        // the 3.0x flag threshold was added to kill.
        val clearBar = if (p >= 1.0) 1.4 else 3.0
        val verdict =
          if (bestQ / p < clearBar) "cleared"
          else if (round == 0) "unadjudicated"
          else if (normRatio <= 1.15) "drift"
          else "plan_suspect"
        f"""{"query":"$n","prev":$p%.3f,"cur":$c%.3f,"ratio":$r%.2f,""" +
          f""""ab_min":$bestQ%.3f,"ab_norm_ratio":$normRatio%.2f,""" +
          s""""verdict":"$verdict"}"""
      }
      .mkString("[", ",", "]")
    val singleSample = results.count { case (n, (_, ok)) => ok && !rerun.contains(n) }
    // Full record (minima + raw samples + regression triage) goes to a
    // FILE; the stdout contract line stays minima-only. Rationale
    // (r12 verdict item 2): the driver stores a 2000-char stdout tail and
    // its JSON parse has been null every round — the old line carried
    // `samples` and `regressions` and had outgrown any parseable size.
    // The file default is an UNTRACKED path: the driver's own runs were
    // clobbering the committed bench_full.json anchor in the working tree.
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"regressions":$regressions,"single_sample":$singleSample,"samples":$samples,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    // The one-line JSON contract, printed as the LAST stdout line (sbt's
    // "[success]" trailer is suppressed in build.sbt for the same reason):
    // same minima as ever in `queries` (ms precision — the raw doubles are
    // in the file), nothing added, nothing removed.
    def ms(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qsLine = results.toSeq.sortBy(_._1)
      .map { case (k, (v, ok)) => "\"" + k + "\":" + (if (ok) ms(v) else "-1") }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qsLine,"failed":$failed,"single_sample":$singleSample,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
