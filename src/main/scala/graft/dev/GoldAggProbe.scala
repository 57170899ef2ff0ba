package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Caches, Exact, PipelineQueries}
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Dev-only: decompose g1's gold stage — fact assembly (broadcast star
  * join) vs the 5-key aggregate with two countDistinct columns (Expand
  * 3x) — and A/B the two-level distinct rewrite (pre-aggregate at
  * (keys, location_key, method_key) grain, then distinct-count the
  * entity keys over the collapsed frame). */
object GoldAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gagg] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count()
    Caches.release()
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      val bronze = Caches.persistTracked(
        PipelineQueries.bronzeFromLineitem(spark, dir))
      val silver0 = BronzeToSilver(bronze)
      val meas = Caches.persistTracked(silver0.measurement)
      val population = bronze.select(col("state_code")).distinct()
        .withColumn("population",
          (col("state_code").cast("int") * 100000 + 7).cast("int"))
      val dd = Caches.persistTracked(
        SilverToGold.dimDate(meas, DimBuild.HashKeys))
      val dp = Caches.persistTracked(
        SilverToGold.dimParameter(silver0.parameter, DimBuild.HashKeys))
      val dm = Caches.persistTracked(
        SilverToGold.dimMethod(silver0.method, DimBuild.HashKeys))
      val dl = Caches.persistTracked(
        SilverToGold.dimLocation(silver0.site, silver0.adminArea,
          silver0.cbsa, population, DimBuild.HashKeys))
      Seq(bronze, meas, dd, dp, dm, dl).foreach(_.count())
      val joined = SilverToGold.fact(meas, dd, dl, dp, dm)
        .join(broadcast(dd.select(col("date_key"), col("year"))),
          Seq("date_key"))
        .join(broadcast(dl.select(
          col("location_key"), col("region"), col("population"))),
          Seq("location_key"))
        .join(broadcast(dp.select(
          col("parameter_key"), col("parameter_name"), col("category"))),
          Seq("parameter_key"))
        .join(broadcast(dm.select(col("method_key"))),
          Seq("method_key"))
      t("fact join noop")(joined
        .write.format("noop").mode("overwrite").save())
      val keys = Seq("year", "region", "parameter_name", "category",
        "aqi_category")
      t("agg multi-distinct")(joined
        .groupBy(keys.head, keys.tail: _*)
        .agg(count(lit(1)).as("n_meas"),
          countDistinct(col("location_key")).as("n_sites"),
          countDistinct(col("method_key")).as("n_methods"),
          sum(when(col("exceeds_standard"), 1L).otherwise(0L)).as("n_exceed"),
          Exact.dsum(col("arithmetic_mean")).as("mean_sum"),
          max(col("aqi")).as("max_aqi"),
          sum(col("observation_count").cast("long")).as("n_obs"),
          max(col("population")).as("max_pop"))
        .write.format("noop").mode("overwrite").save())
      t("agg no distincts")(joined
        .groupBy(keys.head, keys.tail: _*)
        .agg(count(lit(1)).as("n_meas"),
          sum(when(col("exceeds_standard"), 1L).otherwise(0L)).as("n_exceed"),
          Exact.dsum(col("arithmetic_mean")).as("mean_sum"),
          max(col("aqi")).as("max_aqi"),
          sum(col("observation_count").cast("long")).as("n_obs"),
          max(col("population")).as("max_pop"))
        .write.format("noop").mode("overwrite").save())
      t("agg two-level")(joined
        .groupBy((keys ++ Seq("location_key", "method_key")).map(col): _*)
        .agg(count(lit(1)).as("p_n"),
          sum(when(col("exceeds_standard"), 1L).otherwise(0L)).as("p_exceed"),
          sum(col("arithmetic_mean")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("p_mean"),
          max(col("aqi")).as("p_max_aqi"),
          sum(col("observation_count").cast("long")).as("p_obs"),
          max(col("population")).as("p_pop"))
        .groupBy(keys.head, keys.tail: _*)
        .agg(sum(col("p_n")).as("n_meas"),
          countDistinct(col("location_key")).as("n_sites"),
          countDistinct(col("method_key")).as("n_methods"),
          sum(col("p_exceed")).as("n_exceed"),
          sum(col("p_mean")).cast("double").as("mean_sum"),
          max(col("p_max_aqi")).as("max_aqi"),
          sum(col("p_obs")).as("n_obs"),
          max(col("p_pop")).as("max_pop"))
        .write.format("noop").mode("overwrite").save())
      t("agg collect_set")(joined
        .groupBy(keys.head, keys.tail: _*)
        .agg(count(lit(1)).as("n_meas"),
          size(collect_set(col("location_key"))).cast("long").as("n_sites"),
          size(collect_set(col("method_key"))).cast("long").as("n_methods"),
          sum(when(col("exceeds_standard"), 1L).otherwise(0L)).as("n_exceed"),
          Exact.dsum(col("arithmetic_mean")).as("mean_sum"),
          max(col("aqi")).as("max_aqi"),
          sum(col("observation_count").cast("long")).as("n_obs"),
          max(col("population")).as("max_pop"))
        .write.format("noop").mode("overwrite").save())
      Caches.release()
    }
    spark.stop()
  }
}
