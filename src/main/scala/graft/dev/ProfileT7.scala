package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev-only: stage-level timing of the t7 n-gram Jaccard pipeline. */
object ProfileT7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val toks = TF.tokens(col("text"))
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), TF.shingles(toks, 3).as("s"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("shingles count")(sh.count())
      val ex = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
      time("explode count")(ex.count())
      val inter = ex.toDF("doc_a", "shingle")
        .join(ex.toDF("doc_b", "shingle"), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      time("pair agg count")(inter.count())
      val sz = sh.select(col("doc_id"), size(col("s")).as("n"))
      val jac = col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common"))
      val out = inter
        .join(sz.toDF("doc_a", "na"), "doc_a")
        .join(sz.toDF("doc_b", "nb"), "doc_b")
        .filter(jac >= 0.01)
      time("full t7")(out.count())
    }
    spark.stop()
  }
}
