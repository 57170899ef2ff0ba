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
  * reliable `checkpoint` (HDFS/object-store backed, survives executor
  * loss) is chosen automatically whenever the session has a checkpoint
  * dir configured (`spark.sparkContext.setCheckpointDir`) — cluster runs
  * get durability without caller changes; pass `reliable` to override.
  */
object ConnectedComponents {

  /** @param edges    two-column frame (src, dst) of undirected edges.
    * @param maxIter  bound on label-CHANGING propagation rounds: a
    *                 component of diameter d needs d changing rounds, and
    *                 convergence is detected by one further quiescent
    *                 round, which does NOT count against the bound (on
    *                 hitting it, one extra probe round distinguishes
    *                 "already converged" from genuine non-convergence).
    *                 Exceeding the bound with changes still in flight
    *                 throws — silently split components are a correctness
    *                 bug, not a degraded answer.
    * @param reliable Some(true) = reliable `checkpoint` (requires a
    *                 checkpoint dir), Some(false) = `localCheckpoint`,
    *                 None (default) = reliable iff the session has a
    *                 checkpoint dir set.
    * @return (node, component) — component = min node id reachable. */
  def apply(edges: DataFrame, maxIter: Int = 10,
            reliable: Option[Boolean] = None): DataFrame = {
    val useReliable = reliable.getOrElse(
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined)
    def save(df: DataFrame): DataFrame =
      if (useReliable) df.checkpoint() else df.localCheckpoint()

    val sym = save(edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct())

    // One round: every node adopts the min label among itself and its
    // neighbors. One pass computes both the new label and whether it
    // moved; the convergence probe is then a scan of the checkpointed
    // blocks — no second join, no recomputation.
    def round(cur: DataFrame): (DataFrame, Boolean) = {
      val neighborMin = sym
        .join(cur.withColumnRenamed("node", "b")
          .withColumnRenamed("component", "nbr_component"),
          Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min("nbr_component").as("nbr_component"))
      val next = save(cur.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"),
          (coalesce(col("nbr_component"), col("component")) < col("component"))
            .as("changed")))
      val quiet = next.filter(col("changed")).isEmpty
      (next.drop("changed"), quiet)
    }

    var converged = false
    var iter = 0
    var labels = save(sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node")))
    while (!converged && iter < maxIter) {
      val (next, quiet) = round(labels)
      labels = next
      converged = quiet
      iter += 1
    }
    if (!converged) {
      // The bound was hit by a still-changing round — but its updates may
      // already BE the fixpoint (a diameter-d component converges in round
      // d and proves it in round d+1). One probe round settles it without
      // charging the caller an extra diameter unit.
      val (_, quiet) = round(labels)
      if (!quiet)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds — " +
            "a component's diameter exceeds maxIter; raise maxIter")
    }
    labels
  }

  /** Dedup verdicts from an edge list: every node mapped to its cluster's
    * keeper (the minimum id), with an `is_keeper` flag. */
  def keepers(edges: DataFrame): DataFrame =
    apply(edges)
      .select(col("node"), col("component").as("keeper"),
        (col("node") === col("component")).as("is_keeper"))
}
