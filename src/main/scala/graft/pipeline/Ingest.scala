package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Ingestion-side operators. The reference fetches EPA AQS / Census REST
  * payloads on the driver and parallelizes the rows
  * (Batch_ingestion notebook-content.py:119-196, Population Ingestion
  * notebook-content.py:36-47); network egress is out of scope here, so the
  * connector boundary is a local JSON/CSV fixture path — everything after
  * the payload lands is identical.
  */
object Ingest {

  /** Schema-enforced JSON ingestion of an AQS `{"Data":[...]}` payload
    * dumped to a file: explicit schema (no inference — the reference's
    * "FIXED SCHEMA" fix, automated_ingestion notebook-content.py:63), plus
    * partition-column derivation. */
  def aqsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.aqsDaily).json(path)
      .withColumn("year", year(col("date_local")))
      .withColumn("month", month(col("date_local")))

  /** CSV ingestion with header promotion + explicit typing (the Power
    * Query dataflow surface, Dummy Data Upload.Dataflow/mashup.pq:12-14). */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Census population payload cleanup: drop the echoed header row, cast,
    * rename (Population Ingestion notebook-content.py:41-47). */
  def cleanPopulation(raw: DataFrame): DataFrame =
    raw.filter(col("state") =!= "NAME")
      .withColumn("population", col("population").cast("int"))

  /** Rolling re-ingestion window: the reference's weekly run re-pulls
    * T−110d..T−100d because the upstream feed lags ~3 months and restates
    * (Automated Pipeline pipeline-content.json:12,19); combined with the
    * dynamic-partition-overwrite sink this makes re-ingestion idempotent. */
  def rollingWindow(today: java.time.LocalDate,
                    lagDays: Int = 110, spanDays: Int = 10):
      (java.sql.Date, java.sql.Date) =
    (java.sql.Date.valueOf(today.minusDays(lagDays.toLong)),
      java.sql.Date.valueOf(today.minusDays((lagDays - spanDays).toLong)))

  /** Restrict a bronze-shaped frame to an ingestion window (partition
    * pruning applies when date_local is a partition column). */
  def windowFilter(df: DataFrame, from: java.sql.Date, to: java.sql.Date): DataFrame =
    df.filter(col("date_local") >= from && col("date_local") < to)

  /** Ingestion QA gate: fail the run when fewer than `minStates` distinct
    * states are present (automated_ingestion notebook-content.py:249-250). */
  def assertStateCoverage(bronze: DataFrame, minStates: Int): Unit = {
    val n = bronze.select("state_code").distinct().count()
    require(n >= minStates,
      s"ingestion gate: only $n states ingested, need >= $minStates")
  }
}
