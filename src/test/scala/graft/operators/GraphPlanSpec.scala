package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Plan-shape regression pins for the graph family — the three most
  * expensive queries in the registry (t34, t18, cc_components). Each pin
  * asserts the EXECUTED (post-AQE) physical plan, with auto-broadcast
  * disabled so the only broadcasts that can appear are the explicit hints
  * the operators place — the exact property that makes these plans hold
  * at 100 TB, where size-based auto-broadcast never fires for these
  * relations and only the hint (or its absence) decides whether the big
  * side shuffles.
  */
class GraphPlanSpec extends SparkSpec {
  import spark.implicits._

  /** The adaptive plan's final physical tree (what actually ran). */
  private def executedFinal(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Full recursive walk: TreeNode.children stops at AQE stage and
    * exchange-reuse boundaries (both are leaves), so descend through them
    * explicitly. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] =
    walk(p).collect { case s: ShuffleExchangeLike => s }

  private def streamedSide(j: BroadcastHashJoinExec): SparkPlan =
    j.buildSide match {
      case BuildLeft => j.right
      case BuildRight => j.left
    }

  private def noAutoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("t34 round: hinted broadcast survives AQE; the edge list never shuffles") {
    noAutoBroadcast {
      val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
        (3L, 2L), (4L, 5L), (5L, 4L)).toDF("u", "v").persist()
      try {
        edges.count() // materialize: rounds read the cache, as in t34
        val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
        val pr = deg.select(col("u"),
          lit(graft.analytics.TextQueries.CentralityBase).as("pr"))
        val round = graft.analytics.TextQueries.centralityRound(
          edges, deg, pr, nodeRows = 5L)
        round.collect()
        val plan = executedFinal(round)
        val bhj = walk(plan).collect { case j: BroadcastHashJoinExec => j }
        // auto-broadcast is off, so a BroadcastHashJoin here can only be
        // the operator's explicit hint — and it must survive AQE re-plan
        assert(bhj.nonEmpty,
          s"expected the hinted broadcast state join to survive AQE:\n$plan")
        val edgeJoins = bhj.filter(j => walk(streamedSide(j))
          .exists(_.nodeName.contains("InMemoryTableScan")))
        assert(edgeJoins.nonEmpty,
          s"a broadcast join must stream the cached edge list:\n$plan")
        edgeJoins.foreach { j =>
          assert(shuffles(streamedSide(j)).isEmpty,
            s"the edge list must reach the join without an Exchange:\n$plan")
        }
      } finally edges.unpersist()
    }
  }

  test("t18: the corpus streams un-shuffled into the broadcast drop-list join") {
    noAutoBroadcast {
      val df = graft.SparkEntry.queries("t18_dedup_survivors")(
        spark, "/root/testdata/sf0.001")
      try {
        df.collect()
        val plan = executedFinal(df)
        val docJoin = walk(plan).collect {
          case j: BroadcastHashJoinExec if j.joinType == LeftOuter => j
        }
        assert(docJoin.nonEmpty,
          s"documents LEFT JOIN drops must broadcast the drop list:\n$plan")
        docJoin.foreach { j =>
          val streamed = streamedSide(j)
          assert(walk(streamed).exists(_.nodeName.toLowerCase.contains("scan")),
            s"the streamed side must be the documents scan:\n$plan")
          assert(shuffles(streamed).isEmpty,
            s"the corpus must reach the rollup without a shuffle:\n$plan")
        }
      } finally graft.analytics.Caches.release()
    }
  }

  /** Run `f` with the GatedBroadcast threshold forced to `rows`. */
  private def withGate[A](rows: Long)(f: => A): A = {
    spark.conf.set(GatedBroadcast.GateConf, rows.toString)
    try f finally spark.conf.unset(GatedBroadcast.GateConf)
  }

  test("broadcast size gate: above the threshold the hint is withheld " +
      "and the derived small side joins as a keyed shuffle — the " +
      "scale-safe regime a corpus-sized drop list needs") {
    noAutoBroadcast {
      // gate forced to zero: every gated site must fall back
      withGate(0L) {
        val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
          (4L, 5L), (5L, 4L)).toDF("u", "v").persist()
        try {
          edges.count()
          val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
          val pr = deg.select(col("u"),
            lit(graft.analytics.TextQueries.CentralityBase).as("pr"))
          val round = graft.analytics.TextQueries.centralityRound(
            edges, deg, pr, nodeRows = 5L)
          round.collect()
          val plan = executedFinal(round)
          assert(walk(plan).forall(!_.isInstanceOf[BroadcastHashJoinExec]),
            s"above the gate no broadcast hint may survive:\n$plan")
          assert(shuffles(plan).nonEmpty,
            s"the fallback is a keyed exchange, not a driver-side " +
              s"collect:\n$plan")
        } finally edges.unpersist()
      }
    }
  }

  test("broadcast size gate: t18 falls back to a keyed shuffle join " +
      "above the gate with the SAME oracle result") {
    noAutoBroadcast {
      val below = graft.SparkEntry.queries("t18_dedup_survivors")(
        spark, "/root/testdata/sf0.001").collect().toSeq
      graft.analytics.Caches.release()
      withGate(0L) {
        val df = graft.SparkEntry.queries("t18_dedup_survivors")(
          spark, "/root/testdata/sf0.001")
        try {
          val above = df.collect().toSeq
          assert(above === below,
            "both regimes must agree row-for-row")
          val plan = executedFinal(df)
          assert(walk(plan).forall(!_.isInstanceOf[BroadcastHashJoinExec]),
            s"above the gate the drop-list join must not broadcast:\n$plan")
          assert(shuffles(plan).nonEmpty,
            s"expected the keyed-exchange fallback:\n$plan")
        } finally graft.analytics.Caches.release()
      }
    }
  }

  test("broadcast size gate: t16's eval-side join falls back to a keyed " +
      "shuffle above the gate with the SAME oracle result") {
    noAutoBroadcast {
      val below = graft.SparkEntry.queries("t16_contamination")(
        spark, "/root/testdata/sf0.001").collect().toSeq
      graft.analytics.Caches.release()
      withGate(0L) {
        val df = graft.SparkEntry.queries("t16_contamination")(
          spark, "/root/testdata/sf0.001")
        try {
          val above = df.collect().toSeq
          assert(above === below, "both regimes must agree row-for-row")
          val plan = executedFinal(df)
          assert(walk(plan).forall(!_.isInstanceOf[BroadcastHashJoinExec]),
            s"above the gate the eval-side join must not broadcast:\n$plan")
          assert(shuffles(plan).nonEmpty,
            s"expected the keyed-exchange fallback:\n$plan")
        } finally graft.analytics.Caches.release()
      }
    }
  }

  test("cc propagation round: key-partitioned joins only — no broadcast, no nested loop") {
    noAutoBroadcast {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      // materialized inputs, exactly as apply()'s loop sees them
      val sym = edges.unionByName(
        edges.select(col("b").as("a"), col("a").as("b")))
        .distinct().localCheckpoint()
      val cur = sym.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("component")).localCheckpoint()
      val prop = ConnectedComponents.propagateRound(sym, cur)
      prop.collect()
      val plan = executedFinal(prop)
      assert(walk(plan).forall(!_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"no nested-loop join in a CC round:\n$plan")
      assert(walk(plan).forall(!_.isInstanceOf[CartesianProductExec]),
        s"no cartesian product in a CC round:\n$plan")
      assert(walk(plan).forall(!_.isInstanceOf[BroadcastHashJoinExec]),
        s"CC rounds must stay key-partitioned (nothing is small at scale):\n$plan")
      // data movement bound: the neighbor-min join's two key shuffles, the
      // min aggregate, and the label join-back — nothing else
      val n = shuffles(plan).size
      assert(n >= 1 && n <= 5, s"expected 1..5 exchanges, got $n:\n$plan")
    }
  }
}
