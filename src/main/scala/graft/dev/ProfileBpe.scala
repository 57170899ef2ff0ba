package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev-only: decompose the t48 BPE train cost at sf0.1 — the initial
  * corpus word-frequency aggregate vs the 8 vocab-sized merge rounds
  * (each: one pair-count limit(1).collect + one replace+persist+count)
  * — so the optimization targets the measured stage. */
object ProfileBpe {
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
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      var vocab = graft.analytics.Caches.persistTracked(
        Tables.documents(spark, dir)
          .select(explode(TF.tokens(col("text"))).as("word"))
          .filter(col("word").rlike("^[a-z]+$"))
          .groupBy("word").agg(count(lit(1)).as("n"))
          .select(concat(lit(".."),
            regexp_replace(col("word"), "(.)", "$1..")).as("seq"),
            col("n")))
      val n0 = t("init vocab")(vocab.count())
      println(s"  vocab rows=$n0 parts=${vocab.rdd.getNumPartitions}")
      if (args.lift(1).contains("coalesce")) {
        val v = graft.analytics.Caches.persistTracked(vocab.coalesce(1))
        t("re-lay")(v.count())
        vocab.unpersist()
        vocab = v
      }
      (1 to 8).foreach { step =>
        val top = t(s"round $step top")(vocab
          .select(col("n"),
            filter(split(col("seq"), "\\.\\."),
              tk => length(tk) > 0).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("n"),
            slice(col("tk"), lit(1), size(col("tk")) - 1).as("a"),
            slice(col("tk"), lit(2), size(col("tk")) - 1).as("b"))
          .select(col("n"), explode(arrays_zip(col("a"), col("b"))).as("p"))
          .groupBy(col("p.a").as("l"), col("p.b").as("r"))
          .agg(sum("n").as("cnt"))
          .orderBy(desc("cnt"), col("l"), col("r"))
          .limit(1).collect())
        if (top.nonEmpty) {
          val (l, rr) = (top.head.getString(0), top.head.getString(1))
          val next = graft.analytics.Caches.persistTracked(
            vocab.withColumn("seq",
              expr(s"replace(seq, '.$l..$rr.', '.$l$rr.')")))
          t(s"round $step count")(next.count())
          vocab.unpersist()
          vocab = next
        }
      }
      // t49's extra encode pass for reference
      t("encode census")(vocab
        .select(explode(filter(split(col("seq"), "\\.\\."),
          x => length(x) > 0)).as("token"), col("n"))
        .groupBy("token").agg(sum("n").as("n_occ"))
        .orderBy(desc("n_occ"), col("token")).limit(30).collect())
      graft.analytics.Caches.release()
    }
    spark.stop()
  }
}
