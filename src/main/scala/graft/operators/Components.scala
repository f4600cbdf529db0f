package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over candidate-pair edges — the cluster-resolution
  * step a dedup pipeline runs after LSH/Jaccard pairing: every document in
  * a component is a near-duplicate of the others (transitively); the
  * component's min id is the canonical keeper.
  *
  * Algorithm: iterative min-label propagation. Each round joins labels to
  * the (bidirectional) edge list and takes the min neighbor label — one
  * shuffle per round, converging in O(diameter) rounds (near-dup clusters
  * are tiny, so 3-5 rounds in practice; `maxIter` bounds the worst case).
  * This is the standard large-graph formulation (hash-partitioned label
  * table, no driver-side graph), so it scales to billions of edges —
  * unlike a driver union-find.
  */
object Components {

  /** @param nodes  one column `id` (every node, including isolated ones)
    * @param pairs  columns `a`, `b` — undirected candidate edges
    * @return (id, component) where component = min id reachable
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint()
    // localCheckpoint (eager) after every round truncates the lineage —
    // without it the logical plan doubles per iteration and analysis time
    // explodes long before the data does (the classic iterative-algorithm
    // trap; at cluster scale use reliable checkpoint() instead)
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min label among self and neighbors
      val viaEdges = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels
        .join(viaEdges, labels("id") === viaEdges("id2"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .where(col("component") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Cluster summary: component id, size, keeper (= component = min id). */
  def clusters(labels: DataFrame): DataFrame =
    labels.groupBy(col("component"))
      .agg(count(lit(1)).as("size"), min(col("id")).as("keep_id"))
}
