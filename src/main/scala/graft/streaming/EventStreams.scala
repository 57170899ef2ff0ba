package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming facade over the events table (SURVEY §2.10: the
  * reference is scheduled batch; this is the optional streaming surface —
  * the same transforms run incrementally with watermark-bounded state).
  *
  * Scale posture: the windowed rollup keys state by (window, event_type) —
  * bounded by the watermark horizon; sessionization keys state by user_id
  * with an explicit idle-timeout eviction, so state size tracks *active*
  * users, not history.
  */
object EventStreams {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           total_value: Double)

  final case class OpenSession(start: Long, end: Long, n: Long, v: Double)

  /** File-source stream over events parquet data. A streaming read needs
    * an explicit schema, so the files' actual schema is probed with a
    * metadata-only batch read — the harness has shipped `events.ts` both
    * as TIMESTAMP(NANOS) (which `nanosAsLong` surfaces as a LongType of
    * epoch-nanos) and as a plain µs TIMESTAMP, and the stream adapts
    * exactly like the batch-side `Tables.events` does: convert only when
    * the column arrives as a long.
    *
    * `path` must point at event part-files only — a single file, a glob, or
    * a directory containing nothing but event parquet. Globbing a mixed
    * table directory would resolve every non-event file's columns to NULL
    * under one schema. For the harness layout use [[readEventTable]]. */
  def readEventStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val fileSchema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(fileSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.parquet(path)
    fileSchema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Streaming twin of `Tables.events`: streams `$dir/events.parquet` from
    * a harness sf directory (which holds all ten tables flat — the events
    * file must be addressed specifically, not the whole directory). The
    * wildcard keeps the path a glob: FileStreamSource pins `basePath` to a
    * non-glob path, and basePath must be a directory, so a bare file path
    * would throw at the first micro-batch. */
  def readEventTable(spark: SparkSession, dir: String): DataFrame =
    readEventStream(spark, s"$dir/events*.parquet")

  /** Tumbling-hour rollup — the streaming twin of the batch
    * `e1_hourly_rollup` query; late data beyond 2h is dropped at the
    * watermark, closed windows are evicted from state. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on the event id — the ingest-side twin of batch
    * `dropDuplicates`: `dropDuplicatesWithinWatermark` keeps per-key state
    * only until the watermark passes it, so state size tracks the lateness
    * horizon, not history — the property that makes exact dedup viable on
    * an unbounded 100 TB/day feed (a plain streaming dropDuplicates would
    * accumulate every key ever seen). Duplicates arriving within the
    * horizon are suppressed; a replay later than the watermark delay is a
    * new row — callers pick the horizon to match their at-least-once
    * window. */
  def dedupEvents(events: DataFrame,
                  watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Built-in session windows over the stream — the compose-existing-ops
    * counterpart of [[sessionize]]: `session_window` in a watermarked
    * groupBy gives gap-merged sessions from the state store, no custom
    * state function. Windows close (emit + evict) once the watermark
    * passes their end; batch twin: `e5_session_window`. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
                     watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("window_end"), col("n_events"), col("total_value"))

  /** Idempotent streaming upsert sink: each micro-batch is MERGEd into a
    * catalog table insert-only on `key` (the batch's own duplicates
    * collapse first — deterministic keeper = min of the remaining columns'
    * tuple would need an ordering; `dropDuplicates(key)` suffices for
    * replayed identical rows, the at-least-once case this sink exists
    * for). At-least-once delivery + an idempotent merge converge to
    * exactly-once TABLE CONTENTS: a replayed batch re-merges and inserts
    * nothing.
    *
    * This is the streaming twin of the reference's scheduled
    * `whenNotMatchedInsertAll` merges — `foreachBatch` + the same
    * [[graft.operators.MergeInsertOnly]] the batch path uses, then an
    * atomic table swap per batch ([[graft.pipeline.Catalog]]-style). Scale
    * note: per batch this costs one key-shuffle (or broadcast of the
    * batch side) for the anti join — identical to what a Delta streaming
    * merge does internally. */
  def upsertSink(spark: SparkSession, stream: DataFrame, table: String,
                 key: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val target =
          if (spark.catalog.tableExists(table)) spark.table(table)
          else batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), batch.schema)
        val merged = graft.operators.MergeInsertOnly(
          target, batch.dropDuplicates(key), key)
        graft.pipeline.Catalog.overwriteTable(spark, merged, table)
        ()
      }
      .start()

  /** Stream-stream interval join — click→purchase attribution: every
    * (click, purchase) pair for the same user where the click falls in the
    * `windowMinutes` before the purchase (inclusive of the purchase
    * instant). Both branches derive from one event stream (a streaming
    * self-join, supported since Spark 3.x).
    *
    * Scale posture: both sides are watermarked and the join condition
    * bounds each side's event time relative to the other, so Spark evicts
    * join state once the watermark passes `purchase_ts` (click side) /
    * `purchase_ts − window` (purchase side) — state size tracks the
    * lateness horizon + attribution window, not the stream's history.
    * The equi-key (user) partitions state; fan-out per purchase is
    * bounded by that user's clicks inside the window.
    *
    * Batch twin: `e4_attribution` aggregates the same pairs per purchase
    * (LEFT join there, so zero-click purchases surface; the stream emits
    * matched pairs — append-mode inner join). */
  def attributionPairs(events: DataFrame, windowMinutes: Int = 60,
                       watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapMinutes` of user inactivity — emitted on the batch that
    * observes the gap, or via event-time state timeout for users who go
    * idle (once the watermark passes last-event + gap, the open session is
    * emitted and the per-user state evicted, so state size tracks *active*
    * users, not all users ever seen).
    *
    * `watermarkDelay` bounds accepted event lateness; it also bounds how
    * far the watermark trails the data, i.e. how long an idle user's state
    * lingers past its timeout point. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30,
                 watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val gapMillis = gapMinutes * 60L * 1000L

    // µs-exact Timestamp conversions. `Timestamp.getTime` truncates to
    // milliseconds (the µs live in the nanos field), and `new Timestamp(ms)`
    // can't carry them — so both directions must go through the nanos field
    // or streamed session boundaries drift off the µs-exact batch twin
    // (`e3_sessionize`) and parity joins miss.
    def tsMicros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def microsToTs(us: Long): java.sql.Timestamp = {
      val secs = Math.floorDiv(us, 1000000L)
      val ts = new java.sql.Timestamp(secs * 1000L)
      ts.setNanos(((us - secs * 1000000L) * 1000L).toInt)
      ts
    }

    def toSession(uid: Long, s: OpenSession) = Session(
      uid, microsToTs(s.start), microsToTs(s.end), s.n, s.v)

    events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      // Guard the typed cast: Event.user_id is a primitive Long, so a NULL
      // (e.g. from a mis-pointed source) would throw NOT_NULL_ASSERT_VIOLATION
      // deep in the stream instead of being attributable to its row.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed last-event + gap with no new events: the
            // open session is final — emit it and evict the state.
            val out = state.getOption.map(toSession(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => tsMicros(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              open match {
                case Some(s) if t - s.end <= gapMicros =>
                  open = Some(OpenSession(s.start, t, s.n + 1, s.v + e.value))
                case Some(s) =>
                  closed += toSession(uid, s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // Timeout must stay ahead of the watermark (Spark rejects a
              // timestamp at/behind it — possible when allowed-late events
              // extend a session whose timeout point has already passed).
              state.setTimeoutTimestamp(
                math.max(s.end / 1000L + gapMillis, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
