package graft.operators

import graft.functions.JaroWinkler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): blocking → pairwise string
  * scoring → threshold → transitive closure to entity ids. The classic
  * Fellegi-Sunter pipeline skeleton, built from the engine's existing
  * scale pieces — the same candidate-generation discipline as the dedup
  * family (never all-pairs) and the same size-adaptive component
  * resolver as the LSH dedup graph.
  *
  * Physical shape at 100 TB:
  *  - blocking IS the scale lever: candidates meet only inside a block
  *    (hash equi-join on the block key), so total pair volume is
  *    Σ blockSize², not N². Block keys should be cheap and high-recall
  *    (region + name prefix, phonetic key, …);
  *  - a hot block with f records fans out f² — `blockMax` drops blocks
  *    larger than the cap BEFORE the self-join (window count over the
  *    block key, the df-cap pattern from SparseSim/ngramJaccard). An
  *    oversized block means the key under-discriminates: widen the key
  *    rather than raise the cap;
  *  - scoring is the native codegen'd [[JaroWinkler]] expression — one
  *    static call per candidate row inside whole-stage codegen, no
  *    interpreted UDF in the hot path;
  *  - scores are rounded to 6dp BEFORE thresholding, so the keep/drop
  *    decision is identical on any engine that computes the same
  *    rational value (the repo-wide round-then-compare discipline);
  *  - the closure reuses [[Components.connectedComponents]]: driver
  *    union-find under 2²² edges, distributed min-label propagation
  *    above — ER pair graphs are sparse post-threshold, so the small
  *    path is the common case.
  */
object EntityResolution {

  /** Candidate pairs (a < b) inside each block with rounded
    * Jaro-Winkler score >= minSim. Output: (a, b, sim).
    */
  def scoredPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double,
      blockMax: Long = Long.MaxValue): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — all-pairs ER does not scale")
    val base0 = df.select(
      (col(idCol).as("rid_") +: col(nameCol).as("rname_") +:
        blockCols.map(c => col(c))): _*)
    val base =
      if (blockMax == Long.MaxValue) base0
      else base0
        .withColumn("bs_",
          count(lit(1)).over(Window.partitionBy(blockCols.map(col): _*)))
        .where(col("bs_") <= blockMax)
        .drop("bs_")
    val l = base.select(
      (col("rid_").as("a") +: col("rname_").as("na_") +:
        blockCols.map(c => col(c))): _*)
    val r = base.select(
      (col("rid_").as("b") +: col("rname_").as("nb_") +:
        blockCols.map(c => col(c))): _*)
    l.join(r, blockCols)
      .where(col("a") < col("b"))
      .withColumn("sim", round(JaroWinkler.sim(col("na_"), col("nb_")), 6))
      .where(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Entity ids: every record labeled with the minimum record id of its
    * connected component in the >= minSim pair graph (singletons label
    * themselves). Output: (id, component).
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double,
      blockMax: Long = Long.MaxValue): DataFrame = {
    val pairs = scoredPairs(df, idCol, nameCol, blockCols, minSim, blockMax)
      .select(col("a"), col("b"))
    Components.connectedComponents(df.select(col(idCol).as("id")), pairs)
  }
}
