package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose the graph-family cost at sf0.1 — the shared
  * n-gram pair base, the CC rounds (cc/t18/t43/c2 pay them), and the
  * t34 centrality rounds — so optimization targets the measured stage,
  * not a guess. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      // t7's full pipeline (the shared base)
      val scored = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
      time("t7 full")(scored.count())
      graft.analytics.Caches.release()
      // edges at jac >= 0.2 (cc/t18/t43 input), materialized
      val pairsQ = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
      val edges = graft.analytics.Caches.persistTracked(
        pairsQ.filter(col("jac") >= 0.2).select("doc_a", "doc_b"))
      val ne = time("edges build+count")(edges.count())
      println(s"  n_edges=$ne")
      val cc = time("CC total")(
        graft.operators.ConnectedComponents(edges))
      time("CC count")(cc.count())
      graft.analytics.Caches.release()
      // t34 total for reference
      val t34 = graft.SparkEntry.queries("t34_dup_centrality")(spark, dir)
      time("t34 full")(t34.count())
      graft.analytics.Caches.release()
    }
    spark.stop()
  }
}
