package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the ConnectedComponents round overhead on a tiny
  * edge list — as-is vs pre-coalesced input vs shrunken shuffle
  * partitions — to attribute the ~0.9 s CC cost on a 256-edge graph. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val edges0 = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
      .filter(col("jac") >= 0.2).select("doc_a", "doc_b")
    val edges = graft.analytics.Caches.persistTracked(edges0)
    println(s"edges=${edges.count()}"); spark.conf.set("graft.cc.debugTimes", "true")
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      spark.conf.set("graft.cc.adaptiveParts", "false")
      time("CC legacy")(
        graft.operators.ConnectedComponents(edges).count())
      spark.conf.set("graft.cc.adaptiveParts", "true")
      time("CC adaptive")(
        graft.operators.ConnectedComponents(edges).count())
    }
    spark.stop()
  }
}
