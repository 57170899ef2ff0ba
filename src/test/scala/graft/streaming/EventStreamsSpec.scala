package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  private def startStream(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: OutputMode) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", tmpDir(s"ckpt-$name")).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming hourly rollup equals the batch rollup") {
    val dir = "/root/testdata/sf0.001"
    val got = startStream(
      EventStreams.hourlyRollup(EventStreams.readEventTable(spark, dir)),
      "rollup", OutputMode.Complete()).cache()
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    assert(got.count() === batch.count())
    val joined = got.join(batch.withColumnRenamed("n", "bn"), Seq("hour", "event_type"))
    assert(joined.filter(col("n") =!= col("bn")).count() === 0)
  }

  test("sessionization splits on the idle gap and evicts idle state") {
    import spark.implicits._
    val dir = tmpDir("events-sess") + "/data"
    // Timeline is shifted +1 day off epoch zero: the initial watermark is 0,
    // and Spark's late-row predicate drops an event sitting exactly AT the
    // watermark — an epoch-0 event would vanish before the stateful op.
    def ev(uid: Long, minute: Long, v: Double) =
      ((minute + 1440L) * 60L * 1000000000L, uid, "click", v, minute)
    // user 1: events at minute 0,10,20 then 120,125 → one closed session
    // (0-20) once the 120 event arrives; (120-125) stays open in state
    // (its timeout point, 155, is past the final watermark of 95).
    // user 2: single event at minute 30 → idle; the watermark (125 - 30 =
    // 95) passes its timeout point (30 + 30 = 60), so the open session is
    // emitted via event-time timeout and the user's state evicted.
    // Single part-file: the file source then delivers all 6 events in ONE
    // micro-batch, which the timeline reasoning below depends on (split
    // across batches, the watermark from an earlier batch could late-drop
    // the minute-20 event).
    Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 20, 3.0),
      ev(1, 120, 4.0), ev(1, 125, 5.0), ev(2, 30, 9.0))
      .zipWithIndex
      .map { case ((ts, uid, et, v, _), i) => (i.toLong, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.parquet(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) === 1,
      "fixture must be a single part-file so events arrive in one micro-batch")
    val sessions = startStream(
      EventStreams.sessionize(spark,
        EventStreams.readEventStream(spark, dir)).toDF(),
      "sessions", OutputMode.Append()).collect()
      .sortBy(_.getAs[Long]("user_id"))
    sessions.foreach(r => info(s"emitted: $r"))
    assert(sessions.length === 2)
    val u1 = sessions(0)
    assert(u1.getAs[Long]("user_id") === 1L)
    assert(u1.getAs[Long]("n_events") === 3L)
    assert(u1.getAs[Double]("total_value") === 6.0)
    val u2 = sessions(1)
    assert(u2.getAs[Long]("user_id") === 2L)
    assert(u2.getAs[Long]("n_events") === 1L)
    assert(u2.getAs[Double]("total_value") === 9.0)
  }

  test("streaming dedup suppresses within-watermark duplicate event ids") {
    import spark.implicits._
    val dir = tmpDir("events-dedup") + "/data"
    def ev(id: Long, minute: Long, v: Double) =
      (id, (minute + 1440L) * 60L * 1000000000L, 7L, "click", v, "{}")
    // event 10 arrives three times (an at-least-once replay burst), the
    // duplicates well inside the 2h watermark horizon → exactly one
    // survivor; 11/12 are unique
    Seq(ev(10L, 0, 1.0), ev(10L, 5, 1.0), ev(11L, 10, 2.0),
      ev(12L, 20, 3.0), ev(10L, 30, 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.parquet(dir)
    val got = startStream(
      EventStreams.dedupEvents(EventStreams.readEventStream(spark, dir)),
      "dedup", OutputMode.Append())
    assert(got.count() === 3)
    assert(got.select("event_id").as[Long].collect().sorted.toSeq
      === Seq(10L, 11L, 12L))
  }

  test("streaming upsert sink converges to exactly-once table contents") {
    import spark.implicits._
    val dir = tmpDir("events-upsert") + "/data"
    def rows(ids: Seq[Long]) = ids
      .map(i => (i, (i * 60 + 1440L * 60) * 1000000000L, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows(Seq(1L, 2L, 3L)).coalesce(1).write.parquet(dir)
    val q = EventStreams.upsertSink(spark,
      EventStreams.readEventStream(spark, dir), "up_events", Seq("event_id"))
    try {
      q.processAllAvailable()
      assert(spark.table("up_events").count() === 3)
      // second batch replays id 3 (at-least-once delivery) and adds id 4:
      // the merge must insert only the genuinely-new row
      rows(Seq(3L, 4L)).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(spark.table("up_events").select("event_id").as[Long]
        .collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS up_events")
      spark.sql("DROP TABLE IF EXISTS up_events__staging")
    }
  }

  test("stream-stream attribution join matches the batch pair join") {
    val dir = "/root/testdata/sf0.001"
    val got = startStream(
      EventStreams.attributionPairs(EventStreams.readEventTable(spark, dir)),
      "attr", OutputMode.Append()).cache()
    // batch twin of the same inner pair join (e4's pre-aggregation shape)
    val e = graft.sources.Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val batch = p.join(c,
      col("c_user") === col("user_id") &&
        unix_micros(col("click_ts")) > unix_micros(col("purchase_ts")) - 3600000000L &&
        unix_micros(col("click_ts")) <= unix_micros(col("purchase_ts")))
      .select("purchase_id", "click_id")
    assert(got.count() > 0, "fixture data must produce at least one pair")
    assert(got.count() === batch.count())
    val keys = Seq("purchase_id", "click_id")
    assert(got.select(keys.head, keys.tail: _*).join(batch, keys, "left_anti").isEmpty,
      "streamed pair absent from batch join")
    assert(batch.join(got.select(keys.head, keys.tail: _*), keys, "left_anti").isEmpty,
      "batch pair missing from stream")
  }

  test("stream-stream join pairs across micro-batch boundaries") {
    import spark.implicits._
    // The join sides arrive in DIFFERENT micro-batches (one file per
    // trigger): the state store must hold the first side until the second
    // arrives. Whichever file the source picks first, the pair only
    // exists if cross-batch join state works.
    val dir = tmpDir("events-xbatch") + "/data"
    def ev(id: Long, minute: Long, et: String) =
      (id, (minute + 1440L) * 60L * 1000000000L, 5L, et, 1.0, "{}")
    Seq(ev(1L, 10L, "click")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir)
    Seq(ev(2L, 30L, "purchase")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    val got = startStream(
      EventStreams.attributionPairs(
        EventStreams.readEventStream(spark, dir, maxFilesPerTrigger = Some(1))),
      "xbatch", OutputMode.Append()).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("purchase_id") === 2L)
    assert(got.head.getAs[Long]("click_id") === 1L)
  }

  test("streaming session_window aggregates agree with the e5 batch twin") {
    // Append mode emits only watermark-closed windows; every emitted one
    // must appear verbatim in the batch session_window result.
    val dir = "/root/testdata/sf0.001"
    val streamed = startStream(
      EventStreams.sessionWindows(EventStreams.readEventTable(spark, dir)),
      "sw_parity", OutputMode.Append())
    val batch = graft.SparkEntry.queries("e5_session_window")(spark, dir)
      .select("user_id", "session_start", "window_end", "n_events")
    val keys = Seq("user_id", "session_start", "window_end", "n_events")
    val missing = streamed.select(keys.head, keys.tail: _*)
      .join(batch, keys, "left_anti")
    assert(missing.isEmpty, "streamed session window absent from batch twin")
    assert(streamed.count() > 0)
  }

  test("streaming sessions agree with the e3 batch twin") {
    // Every emitted streaming session must appear verbatim in the batch
    // sessionization of the same events (the e3_sessionize formulation).
    val dir = "/root/testdata/sf0.001"
    val streamed = startStream(
      EventStreams.sessionize(spark,
        EventStreams.readEventTable(spark, dir)).toDF(),
      "sess_parity", OutputMode.Append())
    val batch = graft.SparkEntry.queries("e3_sessionize")(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events")
    val missing = streamed
      .select("user_id", "session_start", "session_end", "n_events")
      .join(batch, Seq("user_id", "session_start", "session_end", "n_events"),
        "left_anti")
    assert(missing.isEmpty, "streamed session absent from batch twin")
    assert(streamed.count() > 0)
  }
}
