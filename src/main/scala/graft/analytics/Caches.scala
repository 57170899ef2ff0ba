package graft.analytics

import org.apache.spark.sql.DataFrame

/** Registry for frames persisted inside query builders.
  *
  * Query builders persist multi-consumer stages (LSH signatures, shingle
  * sets) so they compute once; but the builders return lazy DataFrames, so
  * they can't unpersist themselves — the action happens in the caller.
  * Long-lived sessions (Verify/Bench run 40+ queries in one JVM) call
  * [[release]] after each query's action so cached blocks don't accumulate
  * across queries and pressure storage memory.
  *
  * CONCURRENCY CONTRACT: the registry is process-global, so [[release]]
  * unpersists EVERY tracked frame — including one a concurrently running
  * query is still consuming (its stages would silently recompute). All
  * harness entry points (Verify, Bench, the ScalaTest suites) run queries
  * sequentially and call release() between them, which is the assumption
  * this design banks on. If a caller ever runs graft queries concurrently
  * in one JVM, it must either serialize query→release pairs or skip
  * release() and let Spark's storage-memory eviction handle pressure.
  */
object Caches {
  private val reg = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for the next [[release]]. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    df.persist()
    reg += df
    df
  }

  /** Unpersist every tracked frame. */
  def release(): Unit = synchronized {
    reg.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    reg.clear()
  }
}
