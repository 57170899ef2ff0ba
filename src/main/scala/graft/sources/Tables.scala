package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness test tables (TPC-H-ish star schema + events,
  * documents, embeddings — see /root/repo/TESTDATA.md).
  *
  * All reads are plain parquet scans: column pruning and predicate pushdown
  * are left to Catalyst (`SchemaPruning`, `PushDownPredicates`), which at
  * 100 TB means only referenced columns/row-groups are read. Mirrors the
  * reference's bronze parquet scans
  * (Notebooks/Batch_Bronze_to_Silver.Notebook/notebook-content.py:44).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  /** `events.ts` normalization: the harness has shipped the column as
    * TIMESTAMP(NANOS) (which Spark can only read via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, arriving as a long of
    * epoch-nanos) and as a plain µs TIMESTAMP with isAdjustedToUTC=false
    * (arriving as TIMESTAMP_NTZ). Both normalize to the session-zone µs
    * TimestampType every downstream query and the streaming twins use —
    * sessions run in UTC, so the NTZ→LTZ cast reproduces exactly the µs
    * instants DuckDB reads from the same file. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
