package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Caches, PipelineQueries, TempDirs}
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Dev-only: stage-level timings of the g2 lakehouse pipeline — where
  * does the wall time go between the durable writes (silver CTAS,
  * MERGE, 4 dim publishes) and the final star-join read. Two passes:
  * the second is the steady-state one. */
object G2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-g2probe").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { pass =>
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[g2probe $pass] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs $n")
      }
      val cat = s"g2p${pass}_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        TempDirs.scratch("graft-g2probe-wh"))
      val sv = s"$cat.ns.g2_silver"
      var bronze: org.apache.spark.sql.DataFrame = null
      t("bronze persist") {
        bronze = Caches.persistTracked(
          PipelineQueries.bronzeFromLineitem(spark, dir))
        bronze.count()
      }
      val cut = "1995-06-30"
      t("silver CTAS (half 1)") {
        BronzeToSilver(bronze.filter(col("date_local") <= lit(cut)))
          .measurement.writeTo(sv).partitionedBy(col("state_code")).create()
      }
      t("silver MERGE (half 2)") {
        val m = BronzeToSilver(bronze.filter(col("date_local") > lit(cut)))
          .measurement
        m.createOrReplaceTempView(s"g2_incr_$pass")
        val cond = graft.model.Schemas.measurementKey
          .map(c => s"t.$c = s.$c").mkString(" AND ")
        spark.sql(s"MERGE INTO $sv t USING g2_incr_$pass s ON $cond " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      val silverM = spark.table(sv)
      val silver0 = BronzeToSilver(bronze)
      val population = bronze.select(col("state_code")).distinct()
        .withColumn("population",
          (col("state_code").cast("int") * 100000 + 7).cast("int"))
      def publish(name: String, df: org.apache.spark.sql.DataFrame) = {
        df.writeTo(s"$cat.ns.$name").create()
        spark.table(s"$cat.ns.$name")
      }
      var dd, dp, dm, dl: org.apache.spark.sql.DataFrame = null
      t("dim_date publish") {
        dd = publish("g2_dim_date", SilverToGold.dimDate(silverM, DimBuild.HashKeys))
      }
      t("dim_parameter publish") {
        dp = publish("g2_dim_parameter",
          SilverToGold.dimParameter(silver0.parameter, DimBuild.HashKeys))
      }
      t("dim_method publish") {
        dm = publish("g2_dim_method",
          SilverToGold.dimMethod(silver0.method, DimBuild.HashKeys))
      }
      t("dim_location publish") {
        dl = publish("g2_dim_location",
          SilverToGold.dimLocation(silver0.site, silver0.adminArea,
            silver0.cbsa, population, DimBuild.HashKeys))
      }
      t("fact + star join read") {
        val fact = SilverToGold.fact(silverM, dd, dl, dp, dm)
        val n = fact
          .join(dd.select(col("date_key"), col("year")), Seq("date_key"))
          .join(dl.select(col("location_key"), col("region"), col("population")),
            Seq("location_key"))
          .join(dp.select(col("parameter_key"), col("parameter_name"), col("category")),
            Seq("parameter_key"))
          .join(dm.select(col("method_key")), Seq("method_key"))
          .groupBy("year", "region", "parameter_name", "category", "aqi_category")
          .agg(count(lit(1)).as("n_meas"))
          .count()
        s"rows=$n"
      }
      Caches.release()
    }
    spark.stop()
  }
}
