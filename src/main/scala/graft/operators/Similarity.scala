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
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
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
    * ids (a seeded-sample stand-in that keeps runs reproducible; refine
    * with [[kmeansRefine]] for trained cells — the probe-side plan is
    * identical either way).
    */
  def pickCentroids(vecs: DataFrame, vecCol: String, idCol: String,
      numCells: Int): Seq[(Int, Seq[Double])] =
    vecs.orderBy(col(idCol)).limit(numCells)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (row, i) => (i, row.getSeq[Float](0).map(_.toDouble)) }

  /** Lloyd refinement rounds for the IVF coarse quantizer, reproducible
    * across engines: assign every vector to its nearest centroid by
    * cosine, then replace each centroid with its cell's per-dimension
    * SUM vector — the same direction as the mean (cosine is
    * scale-invariant), but with no division step. Sums accumulate in
    * DECIMAL(28,8) (exact, order-independent — the float-summation-order
    * trap is what makes naive distributed k-means non-reproducible) and
    * round to 6 dp. Each round is one broadcast-assign + one explode/agg
    * shuffle; only numCells×dims values ever reach the driver. Cells that
    * lose all members drop out (k shrinks), as in standard Lloyd.
    */
  def kmeansRefine(vecs: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Double])], iters: Int = 1): Seq[(Int, Seq[Double])] = {
    var c = centroids
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(vecs, vecCol, idCol, c)
      val sums = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(sum(col("x").cast("decimal(28,8)")).cast("double"), 6).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("cvec"))
        .collect()
      c = sums.map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    }
    c
  }

  /** IVF probe: assign the query to its `nprobe` nearest cells, scan only
    * those cells, exact cosine inside.
    */
  def ivfSearch(assigned: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Double])], query: Seq[Float], k: Int,
      nprobe: Int): DataFrame = {
    val probeCells = centroids
      .map { case (cid, cvec) =>
        val dot = cvec.zip(query).map { case (x, y) => x * y.toDouble }.sum
        val n1 = math.sqrt(cvec.map(x => x * x).sum)
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
