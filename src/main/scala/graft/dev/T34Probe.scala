package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Caches, TextQueries}

/** Dev-only: interleaved A/B of t34's round chaining — per-round
  * persist vs lazy single-plan (the final top-50 is the only action, so
  * unpersisted rounds still execute exactly once, inside the next
  * round's broadcast-state build). Pairs pipeline cost is excluded: the
  * edge list materializes once and both variants read the same cache. */
object T34Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t34p] $name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warmup (also compiles both shapes)
    graft.SparkEntry.queries("t34_dup_centrality")(spark, dir).count()
    Caches.release()
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      val scored = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
        .select("doc_a", "doc_b")
      val edges0 = Caches.persistTracked(
        scored.select(col("doc_a").as("u"), col("doc_b").as("v"))
          .unionByName(scored.select(col("doc_b").as("u"),
            col("doc_a").as("v"))))
      val deg0 = Caches.persistTracked(
        edges0.groupBy("u").agg(count(lit(1)).as("d")))
      val nNodes = deg0.count()
      val edges = graft.operators.Layout.compact(edges0, edges0.count())
      val deg = graft.operators.Layout.compact(deg0, nNodes)
      def finish(pr: org.apache.spark.sql.DataFrame): Long =
        pr.join(deg, "u")
          .select(col("u").as("doc_id"), col("d").cast("bigint"),
            col("pr").cast("bigint").as("pr"))
          .orderBy(col("pr").desc, col("doc_id")).limit(50).count()
      t("rounds persisted")({
        var pr = deg.select(col("u"),
          lit(TextQueries.CentralityBase).as("pr"))
        val local = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        for (_ <- 1 to 3) {
          pr = TextQueries.centralityRound(edges, deg, pr, nNodes).persist()
          local += pr
        }
        val n = finish(pr)
        local.result().foreach(_.unpersist())
        n
      })
      t("rounds lazy")({
        var pr = deg.select(col("u"),
          lit(TextQueries.CentralityBase).as("pr"))
        for (_ <- 1 to 3)
          pr = TextQueries.centralityRound(edges, deg, pr, nNodes)
        finish(pr)
      })
      Caches.release()
    }
    spark.stop()
  }
}
