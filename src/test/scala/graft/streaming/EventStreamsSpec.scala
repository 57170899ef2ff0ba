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
      EventStreams.hourlyRollup(EventStreams.readEventStream(spark, dir)),
      "rollup", OutputMode.Complete()).cache()
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    assert(got.count() === batch.count())
    val joined = got.join(batch.withColumnRenamed("n", "bn"), Seq("hour", "event_type"))
    assert(joined.filter(col("n") =!= col("bn")).count() === 0)
  }

  test("sessionization splits on the idle gap and carries state") {
    import spark.implicits._
    val dir = tmpDir("events-sess") + "/data"
    def ev(uid: Long, minute: Long, v: Double) =
      (minute * 60L * 1000000000L, uid, "click", v, minute)
    // user 1: events at minute 0,10,20 then 120,125 → one closed session
    // (0-20) once the 120 event arrives; (120-125) stays open in state.
    // user 2: single burst, stays open.
    Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 20, 3.0),
      ev(1, 120, 4.0), ev(1, 125, 5.0), ev(2, 30, 9.0))
      .zipWithIndex
      .map { case ((ts, uid, et, v, _), i) => (i.toLong, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir)
    val sessions = startStream(
      EventStreams.sessionize(spark,
        EventStreams.readEventStream(spark, dir)).toDF(),
      "sessions", OutputMode.Append()).collect()
    assert(sessions.length === 1)
    val s = sessions.head
    assert(s.getAs[Long]("user_id") === 1L)
    assert(s.getAs[Long]("n_events") === 3L)
    assert(s.getAs[Double]("total_value") === 6.0)
  }
}
