package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Partitioned parquet sinks mirroring the reference's bronze layout
  * (SURVEY §2.1 S8/S9). Partition columns `year/month/state` give
  * partition pruning on the dominant filter axes; `repartition` on the
  * partition columns before writing prevents the
  * many-small-files-per-partition problem (each task would otherwise write
  * one file into every partition it touches).
  *
  * Read-side caveat: set
  * `spark.sql.sources.partitionColumnTypeInference.enabled=false` when
  * reading this layout — state codes are leading-zero strings ("06") and
  * inference would silently turn the partition column into ints.
  */
object Writers {

  /** Append-mode partitioned write (Batch_ingestion
    * notebook-content.py:201). */
  def partitionedAppend(df: DataFrame, path: String,
                        partitions: Seq[String]): Unit =
    df.repartition(partitions.map(col): _*)
      .write.mode(SaveMode.Append)
      .partitionBy(partitions: _*).parquet(path)

  /** Idempotent re-ingestion: dynamic partition overwrite replaces exactly
    * the partitions present in `df`, leaving the rest of the table alone
    * (automated_ingestion notebook-content.py:212-213). */
  def partitionedDynamicOverwrite(df: DataFrame, path: String,
                                  partitions: Seq[String]): Unit =
    df.repartition(partitions.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitions: _*).parquet(path)
}
