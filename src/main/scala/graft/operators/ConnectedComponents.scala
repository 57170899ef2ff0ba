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
  * state, no global structures; `localCheckpoint` cuts the lineage so
  * plans don't grow exponentially across iterations.
  */
object ConnectedComponents {

  /** @param edges two-column frame (src, dst) of undirected edges.
    * @return (node, component) — component = min node id reachable. */
  def apply(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val cols = edges.columns
    val sym = edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "b")
          .withColumnRenamed("component", "nbr_component"),
          Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min("nbr_component").as("nbr_component"))
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("component", "old"), Seq("node"))
        .filter(col("component") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
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
