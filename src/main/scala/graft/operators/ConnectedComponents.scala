package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list — the
  * final step of a near-dup pipeline: LSH/fingerprint/simhash emit pairs,
  * components turn pairs into dedup clusters (keeper = min doc id of the
  * component).
  *
  * Algorithm: iterative min-label propagation with pointer-doubling.
  * Each round every node adopts the minimum label among itself and its
  * neighbors; from round [[ConnectedComponents.JumpFrom]] on, a
  * pointer-jump (label ← label(label), one label-table self-join) is
  * appended, so total rounds are O(log diameter) — near-dup clusters are
  * shallow (stars / short chains) and converge in 2-4 plain rounds, while
  * an adversarial chain of length n needs only ~log₂ n jumping rounds
  * instead of n. Each round is one join + one aggregate (plus the jump's
  * self-join when active), all hash-partitioned on the node id — no
  * driver state, no global structures. The convergence check is folded
  * into the same round (a `changed` flag computed with the new labels and
  * read off the materialized result), not a separate join.
  *
  * Materializing each round cuts the lineage so plans don't grow across
  * iterations: `localCheckpoint` (executor-local blocks) for
  * single-node/dev runs; reliable mode writes each round as parquet under
  * a per-run subdirectory of the session's checkpoint dir (HDFS /
  * object-store backed, survives executor loss) and is chosen
  * automatically whenever `spark.sparkContext.setCheckpointDir` is set —
  * cluster runs get durability without caller changes; pass `reliable`
  * to override.
  *
  * Disk retention in reliable mode: unlike `RDD.checkpoint` (whose files
  * Spark only deletes with `spark.cleaner.referenceTracking
  * .cleanCheckpoints` on), every superseded round is deleted as soon as
  * the next round is durable, so a run leaves behind exactly ONE labels
  * file — the returned result, which the returned DataFrame scans
  * lazily. That final file is registered with
  * `FileSystem.deleteOnExit`, so even long-lived JVMs running many
  * dedup passes accumulate one small (node, component) file per
  * still-referenced result, reclaimed at exit.
  */
object ConnectedComponents {

  /** First round that appends a pointer-jump to the propagation step:
    * rounds 1..JumpFrom-1 are pure min-propagation (shallow components —
    * the near-dup norm — converge there with no extra join, keeping the
    * common case at one join+agg per round); deeper structures then go
    * pointer-doubling, reaching the component min in O(log diameter)
    * further rounds (a 1000-node chain: 4 plain + 8 doubling ≈ 12). */
  val JumpFrom = 4

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
    * @param reliable Some(true) = durable per-round parquet (requires a
    *                 checkpoint dir), Some(false) = `localCheckpoint`,
    *                 None (default) = reliable iff the session has a
    *                 checkpoint dir set.
    * @return (node, component) — component = min node id reachable. */
  def apply(edges: DataFrame, maxIter: Int = 10,
            reliable: Option[Boolean] = None): DataFrame = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    val useReliable = reliable.getOrElse(sc.getCheckpointDir.isDefined)

    // Reliable persistence: parquet rounds under <checkpointDir>/cc-<id>.
    // Explicit files (rather than RDD.checkpoint) so superseded rounds can
    // be deleted eagerly — see the class doc's retention contract.
    val runDir = if (useReliable) {
      val base = sc.getCheckpointDir.getOrElse(throw new IllegalStateException(
        "reliable connected components needs spark.sparkContext.setCheckpointDir"))
      Some(new Path(base, "cc-" + java.util.UUID.randomUUID().toString))
    } else None
    lazy val fs = runDir.get.getFileSystem(sc.hadoopConfiguration)
    var seq = 0
    def save(df: DataFrame): (DataFrame, Option[Path]) = runDir match {
      case None => (df.localCheckpoint(), None)
      case Some(dir) =>
        val p = new Path(dir, f"round-$seq%04d")
        seq += 1
        df.write.parquet(p.toString)
        (spark.read.parquet(p.toString), Some(p))
    }
    // Write the new round FIRST, then drop the round it supersedes — the
    // old file backs the job that builds the new one.
    var labelsPath: Option[Path] = None
    def saveLabels(df: DataFrame): DataFrame = {
      val (out, p) = save(df)
      labelsPath.foreach(fs.delete(_, true))
      labelsPath = p
      out
    }

    // No `.distinct()` on the symmetrized list (r20 measurement: the
    // distinct was ~half the CC wall cost at harness scale — one full
    // edge shuffle + its AQE stages): min-label propagation is EXACTLY
    // multi-edge-tolerant (min over duplicated neighbors is the same
    // min), every in-repo caller feeds an aggregate output (unique
    // pairs), and a caller with a materially duplicated edge list pays
    // the dup factor per round — dedupe at the source if that factor
    // is real, not here where unique inputs pay the shuffle every time.
    val debugTimes = spark.conf
      .getOption("graft.cc.debugTimes").exists(_.toBoolean)
    def dbg[T](label: String)(f: => T): T =
      if (!debugTimes) f else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(
          f"[cc] $label ${(System.nanoTime() - t0) / 1e9}%6.3fs"); r
      }
    val (sym0, symPath) = dbg("sym")(save(edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))))

    // SCALE-ADAPTIVE round layout (opt guide §2.2): every round's join
    // and aggregate re-read the materialized edge list, so its
    // partition count is a per-round task-count multiplier. The union
    // above concatenates the caller's partitions (no shuffle), which
    // over-partitions small graphs (the df-capped near-dup norm):
    // estimate the row count from a 3-partition sample of the ALREADY
    // MATERIALIZED sym (O(sampled rows), never a lineage recompute)
    // and coalesce (narrow) to ~rowsPerPartition-sized partitions. At
    // scale the estimate exceeds parts × rowsPerPartition and this is
    // a no-op — the heuristic only ever reduces task counts.
    val sym = {
      val parts = sym0.rdd.getNumPartitions
      if (parts <= 1) sym0
      else {
        val rowsPerPart = spark.conf
          .getOption("graft.shuffle.rowsPerPartition")
          .map(_.toLong).getOrElse(4L * 1024 * 1024)
        val sample = Seq(0, parts / 2, parts - 1).distinct
        val counts = sc.runJob(sym0.rdd,
          (it: Iterator[_]) => {
            var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
          }, sample)
        val est = (counts.sum.toDouble / sample.size * parts).toLong
        val p = math.max(1L, math.min(parts.toLong,
          (est + rowsPerPart - 1) / rowsPerPart)).toInt
        if (p < parts) sym0.coalesce(p) else sym0
      }
    }

    // One round: every node adopts the min label among itself and its
    // neighbors. One pass computes both the new label and whether it
    // moved; the convergence probe is then a scan of the materialized
    // result — no second join, no recomputation.
    //
    // From round `JumpFrom` on, each propagation is followed by a
    // POINTER-JUMP: component ← component(component) — the label-table
    // self-join of pointer-doubling CC (the star-contraction idea of the
    // MapReduce-CC literature). Labels are always node ids of the same
    // component (invariant below), so composing the mapping with itself
    // is sound, and min-label information DOUBLES in reach per round: a
    // diameter-d chain converges in O(log d) jumping rounds instead of
    // d. Shallow components (the near-dup norm: stars, short chains)
    // have converged before round JumpFrom and never pay the extra join.
    //
    // Invariant both steps maintain: component(v) is the id of a node IN
    // v's component with component(v) ≤ v — propagation mins over
    // neighbors' labels (same component; reachability is transitive),
    // the jump takes component(component(v)), which is ≤ component(v)
    // and still in-component.
    def round(cur: DataFrame, jump: Boolean): (DataFrame, Boolean) = {
      val prop = dbg("propagate")(saveLabels(propagateRound(sym, cur)))
      val next = if (!jump) prop
        else dbg("jump")(saveLabels(jumpRound(prop)))
      val quiet = dbg("probe")(next.filter(col("changed")).isEmpty)
      (next.drop("changed"), quiet)
    }

    var converged = false
    // Fused initialization: with self-labels, round 1 would compute
    // min(node, min over neighbors) — but that needs no join against a
    // label table, it IS one aggregation over the symmetrized edges.
    // Start from its output directly: one materialization and one join
    // cheaper, and the loop below begins at round 2. Counts as one
    // label-changing round against maxIter.
    var iter = 1
    var labels = dbg("init")(saveLabels(sym.groupBy(col("a"))
      .agg(min(col("b")).as("nbr_min"))
      .select(col("a").as("node"),
        least(col("nbr_min"), col("a")).as("component"))))
    try {
      while (!converged && iter < maxIter) {
        val (next, quiet) = round(labels, jump = iter + 1 >= JumpFrom)
        labels = next
        converged = quiet
        iter += 1
      }
      if (!converged) {
        // The bound was hit by a still-changing round — but its updates may
        // already BE the fixpoint (a diameter-d component converges in round
        // d and proves it in round d+1). One probe round settles it without
        // charging the caller an extra diameter unit.
        val (next, quiet) = round(labels, jump = true)
        if (!quiet) {
          runDir.foreach(fs.delete(_, true)) // failed run keeps nothing
          throw new IllegalStateException(
            s"connected components did not converge in $maxIter rounds — " +
              "a component's diameter exceeds maxIter; raise maxIter")
        }
        // quiet ⇒ the probe's labels equal the previous round's, and the
        // probe's file is the one that survived eager deletion — hand the
        // caller the frame backed by it.
        labels = next
      }
    } finally {
      // The symmetrized edge list is only needed while iterating; the
      // final labels file stays (the returned frame scans it) and is
      // reclaimed at JVM exit.
      if (runDir.isDefined) {
        symPath.foreach(fs.delete(_, true))
        labelsPath.foreach(fs.deleteOnExit)
      }
    }
    labels
  }

  /** One min-label propagation step (un-materialized): every node adopts
    * the min label among itself and its neighbors, with a `changed` flag
    * computed in the same pass. Both join sides key on the node id and
    * the aggregate runs map-side-partial — per round, the only exchanges
    * are the key hash-shuffles; nothing broadcasts, nothing nest-loops.
    * Extracted from [[apply]]'s loop so the plan-shape spec can pin that
    * contract (GraphPlanSpec). */
  private[operators] def propagateRound(sym: DataFrame, cur: DataFrame): DataFrame = {
    val neighborMin = sym
      .join(cur.withColumnRenamed("node", "b")
        .withColumnRenamed("component", "nbr_component"),
        Seq("b"))
      .groupBy(col("a").as("node"))
      .agg(min("nbr_component").as("nbr_component"))
    cur.join(neighborMin, Seq("node"), "left")
      .select(col("node"),
        least(col("component"), coalesce(col("nbr_component"), col("component")))
          .as("component"),
        (coalesce(col("nbr_component"), col("component")) < col("component"))
          .as("changed"))
  }

  /** The pointer-jump step (un-materialized): component ← component(
    * component) as a label-table self-join. Every component value is a
    * node id with a row in this same table, so the inner mapping is
    * total; left + coalesce only guards the (impossible by invariant)
    * miss. */
  private[operators] def jumpRound(prop: DataFrame): DataFrame = {
    val parent = prop.select(col("node").as("p_node"),
      col("component").as("p_comp"))
    prop.join(parent, col("component") === col("p_node"), "left")
      .select(col("node"),
        coalesce(col("p_comp"), col("component")).as("component"),
        (col("changed") ||
          coalesce(col("p_comp"), col("component")) < col("component"))
          .as("changed"))
  }

  /** Dedup verdicts from an edge list: every node mapped to its cluster's
    * keeper (the minimum id), with an `is_keeper` flag. */
  def keepers(edges: DataFrame): DataFrame =
    apply(edges)
      .select(col("node"), col("component").as("keeper"),
        (col("node") === col("component")).as("is_keeper"))
}
