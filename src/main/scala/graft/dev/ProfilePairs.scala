package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev-only: A/B the n-gram pair pipeline shapes at sf0.1 —
  * (A) the current ngramScored (df-capped instance join: dfreq agg +
  * filter-join + h self-join), vs (B) grouped pair generation (one
  * groupBy h collecting the ≤cap doc list, pairs exploded from the
  * list — no self-join, no dfreq broadcast). Both must produce the
  * IDENTICAL (doc_a, doc_b, n_common) multiset; the checksum proves it
  * before the timings mean anything. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    val cap = graft.analytics.TextQueries.MaxShingleDf

    def shingled(): DataFrame = {
      val toks = TF.tokens(col("text"))
      graft.analytics.Caches.persistTracked(
        Tables.documents(spark, dir)
          .repartition(col("doc_id"))
          .select(col("doc_id"),
            transform(TF.shingles(toks, 3), x => TF.polyHash(x)).as("hs")))
    }

    /** Current shape (mirror of TextQueries.ngramScoredOver). */
    def variantA(): DataFrame = {
      val sh = shingled()
      val sz = sh.select(col("doc_id"), size(col("hs")).as("n"))
      val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
      val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
      val exf = ex.join(dfreq.filter(col("df") <= cap).select("h"), Seq("h"))
      val inter = exf.toDF("h", "doc_a")
        .join(exf.toDF("h", "doc_b"), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      val jac = col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common"))
      inter
        .join(sz.toDF("doc_a", "na"), "doc_a")
        .join(sz.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"), jac.as("jac"))
    }

    /** Candidate: group doc ids per shingle hash (sorted), drop hot
      * shingles by list size, explode ordered pairs from the list. */
    def variantB(): DataFrame = {
      val sh = shingled()
      val sz = sh.select(col("doc_id"), size(col("hs")).as("n"))
      val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
      val grouped = ex.groupBy("h")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) <= cap)
      val pairs = grouped.select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
      val inter = pairs
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      val jac = col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common"))
      inter
        .join(sz.toDF("doc_a", "na"), "doc_a")
        .join(sz.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"), jac.as("jac"))
    }

    /** Candidate C: df-cap via broadcast ANTI join on the HOT shingle
      * list (df > cap — small by construction at any scale where the
      * cap binds) instead of an equi-join with the cold key set. */
    def variantC(): DataFrame = {
      val sh = shingled()
      val sz = sh.select(col("doc_id"), size(col("hs")).as("n"))
      val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
      val hot = ex.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("h")
      val exf = ex.join(broadcast(hot), Seq("h"), "left_anti")
      val inter = exf.toDF("h", "doc_a")
        .join(exf.toDF("h", "doc_b"), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      val jac = col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common"))
      inter
        .join(sz.toDF("doc_a", "na"), "doc_a")
        .join(sz.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"), jac.as("jac"))
    }

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_a, doc_b, n_common, na, nb))")).head()
      (r.getLong(0), r.getLong(1))
    }
    val ca = checksum(variantA()); graft.analytics.Caches.release()
    val cb = checksum(variantB()); graft.analytics.Caches.release()
    val cc = checksum(variantC()); graft.analytics.Caches.release()
    println(s"checksum A=$ca B=$cb C=$cc identical=${ca == cb && ca == cc}")
    for (r <- 1 to reps; (tag, mk) <- Seq(
        "A" -> (() => variantA()), "C" -> (() => variantC()))) {
      val t0 = System.nanoTime()
      val n = mk().count()
      graft.analytics.Caches.release()
      println(f"rep $r $tag: ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r stages")
      val sh = shingled()
      t("sh persist")(sh.count())
      val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
      val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
      t("dfreq")(dfreq.filter(col("df") <= cap).count())
      val exf = ex.join(dfreq.filter(col("df") <= cap).select("h"), Seq("h"))
      val inter = exf.toDF("h", "doc_a")
        .join(exf.toDF("h", "doc_b"), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      t("inter")(inter.count())
      t("full A")(variantA().count())
      graft.analytics.Caches.release()
      // raw shingle-hash projection WITHOUT persist, to isolate compute
      val toks = TF.tokens(col("text"))
      val rawsh = Tables.documents(spark, dir)
        .select(col("doc_id"),
          transform(TF.shingles(toks, 3), x => TF.polyHash(x)).as("hs"))
      t("rawsh agg")(rawsh.select(sum(size(col("hs")))).head())
      val rawtok = Tables.documents(spark, dir)
        .select(col("doc_id"), toks.as("l"))
      t("rawtok agg")(rawtok.select(sum(size(col("l")))).head())
    }
    spark.stop()
  }
}
