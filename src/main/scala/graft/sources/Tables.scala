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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read as a
    * timestamp; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/Sessions) it arrives as a long of epoch-nanos, which we
    * convert to a microsecond TimestampType — the same µs values DuckDB
    * produces when it reads the file. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(s, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
