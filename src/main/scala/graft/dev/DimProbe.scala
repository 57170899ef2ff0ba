package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Caches, PipelineQueries}
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Dev-only: decompose dimLocation's cost (the slowest g1 dim stage —
  * G1Probe2 shows 2.4-2.5 s at sf0.1) into its four bronze extracts,
  * the join+region mapping, and the surrogate-key window. */
object DimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dimp] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // warmup
    graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count()
    Caches.release()
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      val bronze = Caches.persistTracked(
        PipelineQueries.bronzeFromLineitem(spark, dir))
      bronze.count()
      val population = bronze.select(col("state_code")).distinct()
        .withColumn("population",
          (col("state_code").cast("int") * 100000 + 7).cast("int"))
      t("site noop")(BronzeToSilver.site(bronze)
        .write.format("noop").mode("overwrite").save())
      t("adminArea noop")(BronzeToSilver.adminArea(bronze)
        .write.format("noop").mode("overwrite").save())
      t("cbsa noop")(BronzeToSilver.cbsa(bronze)
        .write.format("noop").mode("overwrite").save())
      t("population noop")(population
        .write.format("noop").mode("overwrite").save())
      t("dimLocation noop")(SilverToGold.dimLocation(
        BronzeToSilver.site(bronze), BronzeToSilver.adminArea(bronze),
        BronzeToSilver.cbsa(bronze), population, DimBuild.HashKeys)
        .write.format("noop").mode("overwrite").save())
      // variant A (measured SLOWER, r20 — kept as the negative-result
      // record): one site-grain min_by aggregate substituting all four
      // extracts; the struct-valued min_by update is heavier than the
      // four narrow codegen distincts, which already overlap inside the
      // one dimLocation job
      t("minby substrate")({
        val g = Caches.persistTracked(
          bronze.groupBy("state_code", "county_code", "site_number").agg(
            min_by(struct(col("local_site_name"), col("site_address"),
              col("city"), col("latitude"), col("longitude"),
              col("cbsa_code"), col("datum")), col("local_site_name"))
              .as("sa"),
            min(struct(col("state").as("state_name"),
              col("county").as("county_name"))).as("aa"),
            min(col("cbsa")).as("cbsa_name")))
        val site = g.select(col("state_code"), col("county_code"),
          col("site_number"), col("sa.local_site_name"),
          col("sa.site_address"), col("sa.city"), col("sa.latitude"),
          col("sa.longitude"), col("sa.cbsa_code"), col("sa.datum"))
        val adminArea = g.groupBy("state_code", "county_code")
          .agg(min(col("aa")).as("aa"))
          .select(col("state_code"), col("aa.state_name"),
            col("county_code"), col("aa.county_name"))
        val cb = g.filter(col("sa.cbsa_code").isNotNull)
          .groupBy(col("sa.cbsa_code").as("cbsa_code"))
          .agg(min(col("cbsa_name")).as("cbsa_name"))
        val pop = g.select(col("state_code")).distinct()
          .withColumn("population",
            (col("state_code").cast("int") * 100000 + 7).cast("int"))
        SilverToGold.dimLocation(site, adminArea, cb, pop, DimBuild.HashKeys)
          .write.format("noop").mode("overwrite").save()
      })
      // variant B (measured SLOWER still): plain 13-col distinct
      // substrate, entity dedups on top — the extra persist
      // materialization job plus the tiny per-entity dedup jobs cost
      // more than the overlapped narrow extracts they replace
      t("distinct substrate")({
        val g = Caches.persistTracked(bronze.select(
          col("state_code"), col("county_code"), col("site_number"),
          col("local_site_name"), col("site_address"), col("city"),
          col("latitude"), col("longitude"), col("cbsa_code"), col("datum"),
          col("state").as("state_name"), col("county").as("county_name"),
          col("cbsa").as("cbsa_name")).distinct())
        val site = graft.operators.Dedup.deterministicSmall(
          g.select("state_code", "county_code", "site_number",
            "local_site_name", "site_address", "city", "latitude",
            "longitude", "cbsa_code", "datum"),
          key = Seq("state_code", "county_code", "site_number"),
          tiebreak = Seq("local_site_name"))
        val adminArea = graft.operators.Dedup.deterministicSmall(
          g.select(col("state_code"), col("state_name"),
            col("county_code"), col("county_name")),
          key = Seq("state_code", "county_code"),
          tiebreak = Seq("state_name", "county_name"))
        val cbsa = graft.operators.Dedup.deterministicSmall(
          g.filter(col("cbsa_code").isNotNull)
            .select(col("cbsa_code"), col("cbsa_name")),
          key = Seq("cbsa_code"), tiebreak = Seq("cbsa_name"))
        val pop = g.select(col("state_code")).distinct()
          .withColumn("population",
            (col("state_code").cast("int") * 100000 + 7).cast("int"))
        SilverToGold.dimLocation(site, adminArea, cbsa, pop, DimBuild.HashKeys)
          .write.format("noop").mode("overwrite").save()
      })
      Caches.release()
    }
    spark.stop()
  }
}
