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

  /** Session conf key selecting the materialization mode for tracked
    * stages: "persist" (default — in-memory/disk blocks, right for
    * harness SFs) or "checkpoint" (`localCheckpoint(eager=false)`) — the
    * 100 TB setting: a multi-consumer stage whose blocks would not fit
    * storage memory is cut to executor-local shuffle files instead, and
    * the lineage truncation also keeps re-planning cost flat when the
    * cached stage feeds many consumers. One conf flip, no query changes. */
  val ModeKey = "spark.graft.cache.mode"

  /** Persist `df` (or checkpoint, per [[ModeKey]]) and remember it for
    * the next [[release]]. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    val mode = df.sparkSession.conf.get(ModeKey, "persist")
    val out = mode match {
      case "checkpoint" => df.localCheckpoint(eager = false)
      case _ => { df.persist(); df }
    }
    reg += out
    out
  }

  /** Unpersist every tracked frame. Checkpointed frames don't expose an
    * unpersist hook — dropping the reference here hands their blocks to
    * the ContextCleaner, which reclaims them on GC (the standard
    * lifecycle for localCheckpoint storage). */
  def release(): Unit = synchronized {
    reg.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    reg.clear()
  }
}
