package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev-only: stage-level timing of the t5 MinHash+LSH pipeline.
  *
  * Round-3 finding pinned here: an expensive HOF array expression used as
  * an explode/posexplode GENERATOR re-evaluates per generated row (~8×
  * measured at sf0.1: 0.4s to force-evaluate all signatures vs ~10s to
  * explode them), and neither an Exchange nor carrying the column dodges
  * it — only a persist/cache boundary between the signature projection and
  * the Generate does. That is why t5 persists its signature stage.
  */
object ProfileT5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val toks = TF.tokens(col("text"))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val sh = Tables.documents(spark, dir).repartition(col("doc_id"))
        .select(col("doc_id"), TF.shingles(toks, 3).as("sh"))
      val asArray = sh.select(col("doc_id"),
        array((0 until 8).map(p => TF.minhash(col("sh"), p)): _*).as("mhs"))
      time("force-eval-all-sigs")(
        asArray.select(expr("aggregate(mhs, 0L, (a,b) -> a+b)").as("x"))
          .agg(sum("x")).count())
      time("explode-unpersisted")(
        asArray.select(col("doc_id"), posexplode(col("mhs"))).count())
      val pa = asArray.persist()
      time("explode-from-cache")(
        pa.select(col("doc_id"), col("mhs"), posexplode(col("mhs"))).count())
      pa.unpersist()
      time("t5-full")(
        graft.SparkEntry.queries("t5_minhash_lsh")(spark, dir).count())
      graft.analytics.Caches.release()
    }
    spark.stop()
  }
}
