package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a ~10× scale point from sf0.1 for the scale soak (SCALE_NOTES):
  * `Test/runMain graft.tools.ScaleUp [copies] [outDir]`.
  *
  * The driver ships sf0.001/0.01/0.1 only; the soak needs one more
  * order of magnitude to show candidate-count growth empirically. Each
  * table is replicated `copies`× with DISJOINT key spaces (stride
  * offsets), and the payload is decorrelated per copy so the result
  * statistically resembles a larger corpus instead of k identical
  * clones (which would manufacture quadratic near-dup cliques no real
  * corpus has):
  *
  *  - documents: EVERY token gets a copy-specific suffix — a per-copy
  *    vocabulary namespace. Within-copy similarity structure (the
  *    realistic part) is preserved EXACTLY (one shared bijection on the
  *    vocab), while cross-copy token sets are disjoint, so cosine,
  *    Jaccard, simhash and shingle overlap across copies are all ~zero.
  *    The result is ten independent sf0.1-shaped shards — the honest
  *    10× corpus. (First attempt suffixed only every 8th token;
  *    similarity-robust families — simhash, token-count cosine — saw
  *    the copies as 10-cliques of near-dups and pair counts exploded
  *    ~100×: a measurement artifact of weak perturbation, not an
  *    engine behavior. Namespacing removes it.) n_chars re-derived.
  *  - embeddings: components rotated by k positions — norm and
  *    coordinate distribution preserved, cross-copy cosine ≈ chance.
  *  - events: new user population per copy (same time window → 10× the
  *    event rate, which is how traffic actually scales).
  *  - lineitem: new order keys per copy; part space kept (pair-count
  *    growth stays interpretable: baskets 10×, catalog fixed).
  *
  * Output under target/scale/ — NOT driver testdata; correctness gates
  * never read this.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val out = if (args.length > 1) args(1)
      else "/root/repo/target/scale/sf1x"
    val in = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val S = 10000000L
    // fixed-width name pad: wide enough for the largest per-copy block
    // number at THIS copies count, never narrower than the unscaled
    // corpus's 9 digits (so k=0 names match sf0.1 verbatim)
    val nameW = math.max(9, (copies.toLong * S).toString.length)

    def replicate(name: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$in/$name.parquet")
      // write in ≤10-copy chunks: a single 100-arm union plan is one
      // giant codegen stage re-scanning the input 100× concurrently and
      // aborted transiently at copies=100 — chunked appends are the
      // same rows with bounded per-job width
      (0 until copies).grouped(10).zipWithIndex.foreach { case (ks, i) =>
        val chunk = ks.map(k => xform(base, k)).reduce(_ unionByName _)
        chunk.write.mode(if (i == 0) "overwrite" else "append")
          .parquet(s"$out/$name.parquet")
      }
      println(s"SCALED $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    replicate("documents") { (df, k) =>
      val txt = if (k == 0) col("text")
      else array_join(transform(split(col("text"), " "),
        t => concat(t, lit(s"~$k"))), " ")
      df.select((col("doc_id") + k * S).as("doc_id"), txt.as("text"),
        col("lang"), col("source"), length(txt).cast("long").as("n_chars"))
    }

    replicate("embeddings") { (df, k) =>
      // rotation wraps mod dims, so copies k and k+64 share a rotation —
      // IDENTICAL vectors, 36 clone-copy pairs at copies=100 (measured:
      // the clones ~double the ε-graph density of the 100× dbscan soak,
      // SCALE_NOTES r11). The cure is a per-GENERATION (g = k/64)
      // deterministic sign pattern applied after the rotation: flipping
      // a fixed component set is an orthogonal transform (within-copy
      // cosines untouched) that decorrelates the generations. g = 0
      // keeps the identity so corpora at copies <= 64 are bit-identical
      // to the historical ones.
      val r = k % 64
      val g = k / 64
      val rot =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r))
      val decorrelated =
        if (k == 0) col("embedding")
        else if (g == 0) rot
        else {
          // signs from the same md5 family as the engine's hyperplanes;
          // seeded by generation so every g gets an independent pattern
          val signs = (0 until 64).map(i =>
            if (graft.functions.HashFunctions
              .hash64Jvm(s"scaleup-gen#$g#$i") % 2 == 0) 1.0f else -1.0f)
          zip_with(rot, typedLit(signs), (a, s) => (a * s).cast("float"))
        }
      df.select((col("vec_id") + k * S).as("vec_id"),
        decorrelated.as("embedding"), col("label"))
    }

    replicate("events") { (df, k) =>
      df.select((col("event_id") + k * S).as("event_id"), col("ts"),
        (col("user_id") + k * S).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }

    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + k * S)
    }

    // customer/orders: FRESH population per copy (the events model) —
    // custkeys shift by the stride and names are re-derived from the
    // NEW key, so cross-copy name similarity is exactly the within-copy
    // ambient level (re-using the old names verbatim would hand every
    // ER probe k-cliques of perfect matches — the round-9 weak-
    // perturbation lesson). Orders keep their copy's customers and
    // order keys aligned with lineitem's stride.
    replicate("customer") { (df, k) =>
      // the name's number lives in a per-copy block so the fixed-width
      // "Customer#%0Nd" format (and with it the within-copy
      // JW-similarity ambient level) is IDENTICAL to the unscaled
      // corpus at every k, including k = 0. The block stride is the
      // SAME S used for the keys — a fixed 1e6 block would collide
      // names across copies once base custkeys reach 1e6 (sf10+),
      // seeding exactly the perfect-match cliques this scheme avoids.
      // Width grows with the largest possible number so lpad never
      // truncates.
      df.select((col("c_custkey") + k * S).as("c_custkey"),
        concat(lit("Customer#"),
          lpad((col("c_custkey") + k * S).cast("string"), nameW, "0"))
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }

    replicate("orders") { (df, k) =>
      df.select((col("o_orderkey") + k * S).as("o_orderkey"),
        (col("o_custkey") + k * S).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }

    // fixed catalogs (lineitem keeps its part/supp keys): copied once,
    // unreplicated, so FK-profile gates can run against this directory
    for (t <- Seq("part", "supplier", "nation", "region"))
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    spark.stop()
  }
}
