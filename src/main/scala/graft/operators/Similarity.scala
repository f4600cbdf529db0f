package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; full scan +
  * TakeOrderedAndProject — fine to ~10⁸ rows/query batch). Scale paths:
  *  - IVF: k-means-style coarse quantizer → probe nearest cells only.
  *    Centroids here are derived deterministically (seeded sample) so
  *    results are reproducible; at 100 TB the centroid table is broadcast
  *    and the store is laid out partitioned by cell → partition pruning.
  *  - RHP-LSH buckets (see [[graft.search.Search.lshSearch]]).
  */
object Similarity {

  /** Exact top-k neighbors of one query vector. */
  def bruteForceTopK(vecs: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame =
    vecs
      .withColumn("score", round(
        VectorFunctions.cosine(col(vecCol), typedLit(query), query.length), 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))

  /** Exact top-k neighbors for EVERY query row (batch KNN join).
    * Broadcast the (small) query side, rank per query with a window.
    * At scale: broadcast-NL join + per-partition partial top-k via the
    * window — the heavy side streams once.
    */
  def knnJoin(base: DataFrame, queries: DataFrame, vecCol: String,
      baseId: String, queryId: String, k: Int, dims: Int = 0): DataFrame = {
    val b = base.select(col(baseId).as("base_id"), col(vecCol).as("base_vec"))
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("query_vec"))
    val scored = b.crossJoin(broadcast(q))
      .where(col("base_id") =!= col("query_id")) // self excluded BEFORE ranking
      .withColumn("score", round(
        if (dims > 0) VectorFunctions.cosine(col("base_vec"), col("query_vec"), dims)
        else VectorFunctions.cosine(col("base_vec"), col("query_vec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("base_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("base_id"), col("score"), col("rank"))
  }

  /** IVF cell assignment: nearest of `centroids` (broadcast literal table)
    * by cosine. Returns the input plus a `cell` column; write-time
    * partitioning by `cell` turns probe queries into partition-pruned
    * scans.
    */
  def ivfAssign(vecs: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dims = centroids.head._2.length
    // broadcast the tiny centroid table and argmax per row — one codegen'd
    // cosine per (row, centroid) instead of a single giant expression tree
    // (which exceeds codegen limits and falls back to interpretation);
    // max(struct(sim, cell)) keeps the (sim, then cell) tie-break
    val cdf = broadcast(centroids.toDF("cell", "cvec"))
    val best = vecs.select(col(idCol), col(vecCol))
      .crossJoin(cdf)
      .withColumn("sim", VectorFunctions.cosine(col(vecCol), col("cvec"), dims))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), col("cell"))).getField("cell").as("cell"))
    vecs.join(best, idCol)
  }

  /** Deterministic centroid pick: the `numCells` vectors with the smallest
    * ids (a seeded-sample stand-in that keeps runs reproducible; real
    * pipelines would run k-means — the probe-side plan is identical).
    */
  def pickCentroids(vecs: DataFrame, vecCol: String, idCol: String,
      numCells: Int): Seq[(Int, Seq[Float])] =
    vecs.orderBy(col(idCol)).limit(numCells)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (row, i) => (i, row.getSeq[Float](0)) }

  /** IVF probe: assign the query to its `nprobe` nearest cells, scan only
    * those cells, exact cosine inside.
    */
  def ivfSearch(assigned: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Float])], query: Seq[Float], k: Int,
      nprobe: Int): DataFrame = {
    val probeCells = centroids
      .map { case (cid, cvec) =>
        val dot = cvec.zip(query).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val n1 = math.sqrt(cvec.map(x => x.toDouble * x.toDouble).sum)
        val n2 = math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
        (cid, dot / (n1 * n2))
      }
      .sortBy(-_._2).take(nprobe).map(_._1)
    assigned
      .where(col("cell").isin(probeCells: _*))
      .withColumn("score", round(
        VectorFunctions.cosine(col(vecCol), typedLit(query), query.length), 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cell"), col("score"))
  }
}
