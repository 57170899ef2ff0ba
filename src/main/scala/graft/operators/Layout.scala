package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive narrow re-lay for small MATERIALIZED frames (opt
  * guide §2.2): iterative operators (centrality rounds, BPE merges, CC
  * label rounds) re-read their cached state every round, so its
  * partition count is a per-round TASK-COUNT multiplier — and a cached
  * aggregate inherits `spark.sql.shuffle.partitions` partitions no
  * matter how few rows it holds (AQE does not re-lay cached plans).
  * `compact` coalesces (narrow, no shuffle) to ~rowsPerPartition-sized
  * partitions using a row count the caller already paid for; it only
  * ever REDUCES partition counts, so at a scale where the frame fills
  * its layout it is a no-op and cluster plans are untouched. */
object Layout {

  /** Session override for the target rows-per-partition of compacted
    * small frames (shared with ConnectedComponents' sampled variant). */
  val RowsPerPartitionConf = "graft.shuffle.rowsPerPartition"
  val DefaultRowsPerPartition: Long = 4L * 1024 * 1024

  def rowsPerPartition(df: DataFrame): Long =
    df.sparkSession.conf.getOption(RowsPerPartitionConf)
      .map(_.toLong).getOrElse(DefaultRowsPerPartition)

  /** Narrow coalesce of `df` (cached/checkpointed, `rows` known from a
    * count the caller already ran) to ceil(rows / rowsPerPartition)
    * partitions, clamped to never increase the partition count. */
  def compact(df: DataFrame, rows: Long): DataFrame = {
    val parts = df.rdd.getNumPartitions
    if (parts <= 1) df
    else {
      val rpp = rowsPerPartition(df)
      val p = math.max(1L, math.min(parts.toLong,
        (rows + rpp - 1) / rpp)).toInt
      if (p < parts) df.coalesce(p) else df
    }
  }
}
