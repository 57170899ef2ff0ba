package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list — the
  * final step of a near-dup pipeline: LSH/fingerprint/simhash emit pairs,
  * components turn pairs into dedup clusters (keeper = min doc id of the
  * component).
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * adopts the minimum label among itself and its neighbors — converges in
  * O(component diameter) rounds; near-dup clusters are shallow (stars /
  * short chains), so 3-6 rounds suffice in practice. Each round is one
  * join + one aggregate, both hash-partitioned on the node id — no driver
  * state, no global structures. The convergence check is folded into the
  * same round (a `changed` flag computed with the new labels and read off
  * the checkpointed result), not a separate join.
  *
  * Checkpointing cuts the lineage so plans don't grow across iterations:
  * `localCheckpoint` (executor-local blocks) for single-node/dev runs;
  * pass `reliable = true` on a cluster with
  * `spark.sparkContext.setCheckpointDir` configured so labels survive
  * executor loss (HDFS/object-store backed).
  */
object ConnectedComponents {

  /** @param edges    two-column frame (src, dst) of undirected edges.
    * @param maxIter  propagation-round bound; exceeding it with changes
    *                 still in flight throws (silently split components are
    *                 a correctness bug, not a degraded answer).
    * @param reliable use reliable `checkpoint` (requires a checkpoint dir)
    *                 instead of `localCheckpoint`.
    * @return (node, component) — component = min node id reachable. */
  def apply(edges: DataFrame, maxIter: Int = 10,
            reliable: Boolean = false): DataFrame = {
    def save(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val sym = save(edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct())

    var labels = save(sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node")))

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "b")
          .withColumnRenamed("component", "nbr_component"),
          Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min("nbr_component").as("nbr_component"))
      // One pass computes both the new label and whether it moved; the
      // convergence probe is then a scan of the checkpointed blocks —
      // no second join, no recomputation.
      val next = save(labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"),
          (coalesce(col("nbr_component"), col("component")) < col("component"))
            .as("changed")))
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "a component's diameter exceeds maxIter; raise maxIter")
    labels
  }

  /** Dedup verdicts from an edge list: every node mapped to its cluster's
    * keeper (the minimum id), with an `is_keeper` flag. */
  def keepers(edges: DataFrame): DataFrame =
    apply(edges)
      .select(col("node"), col("component").as("keeper"),
        (col("node") === col("component")).as("is_keeper"))
}
