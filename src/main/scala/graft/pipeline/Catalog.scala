package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog publication layer — the warehouse-serving emulation
  * (SURVEY §2.1 S10-S12). The reference overwrites Delta tables and
  * TRUNCATE+copies them into a SQL warehouse
  * (Automated_Silver_to_Gold notebook-content.py:256-260, Automated
  * Pipeline pipeline-content.json:82-172); without Delta locally, the same
  * contract is: write to a staging table, then swap via catalog rename —
  * readers of the old table are never exposed to a half-written state.
  */
object Catalog {

  /** Atomic-swap overwrite: stage → drop old → rename staging. */
  def overwriteTable(spark: SparkSession, df: DataFrame, name: String): Unit = {
    val staging = s"${name}__staging"
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"ALTER TABLE $staging RENAME TO $name")
  }

  /** Publish a set of tables into a warehouse namespace (`wh_` prefix),
    * the TRUNCATE-then-copy ≡ overwrite equivalence noted in SURVEY §2.1
    * S12 — each table goes through the atomic stage+swap. */
  def publishWarehouse(spark: SparkSession,
                       tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) =>
      overwriteTable(spark, df, "wh_" + name)
    }

  /** The reference's concrete publication set: the gold star schema. */
  def publishWarehouse(spark: SparkSession, gold: SilverToGold.Gold): Unit =
    publishWarehouse(spark, Map(
      "dim_date" -> gold.dimDate,
      "dim_location" -> gold.dimLocation,
      "dim_parameter" -> gold.dimParameter,
      "dim_method" -> gold.dimMethod,
      "fact_daily_air_quality" -> gold.fact))
}
