package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** The streaming-sink half of [[GraftTable]] (`writeStream.toTable` —
  * the Delta streaming-sink path): per-epoch installs through the
  * builder's chosen mode, (queryId, epochId)-deduplicated in the table's
  * epoch ledger, composing with the streaming source into a pure
  * table-to-table pipe with no foreachBatch glue. */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val fq = s"graft_cat.ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    fq
  }

  private def store(name: String): GraftTable =
    GraftTableStore.tables((Seq("ns"), name))

  test("catalog-to-catalog pipe: toTable appends exactly once across " +
      "checkpointed passes") {
    val src = freshTable("t_sink_src")
    val dst = freshTable("t_sink_dst")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").writeTo(src).create()
    spark.sql(s"INSERT INTO $src VALUES (3, 'c')")
    spark.sql(s"CREATE TABLE $dst (id BIGINT, v STRING)")
    val ckpt = tmpDir("ckpt-sink")

    def pipe(): Unit = {
      val q = spark.readStream.table(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(dst)
      q.awaitTermination()
    }
    pipe()
    assert(spark.table(dst).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // nothing new → the sink receives nothing
    pipe()
    assert(spark.table(dst).count() === 3)

    // two more source commits; the checkpointed pass lands them once
    spark.sql(s"INSERT INTO $src VALUES (4, 'd')")
    spark.sql(s"INSERT INTO $src VALUES (5, 'e')")
    pipe()
    assert(spark.table(dst).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("epoch ledger: a replayed epoch installs exactly once, later " +
      "epochs proceed, queries are independent") {
    val t = freshTable("t_sink_epoch")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    val table = store("t_sink_epoch")
    def batch(ids: Long*): Array[Array[org.apache.spark.sql.catalyst.InternalRow]] =
      Array(ids.toArray.map(i =>
        org.apache.spark.sql.catalyst.InternalRow(i)))

    table.installStreamingEpoch("q1", 0, GraftDeliveries.rows(batch(1L)), table.installAppend)
    table.installStreamingEpoch("q1", 0, GraftDeliveries.rows(batch(1L)), table.installAppend) // replay
    assert(spark.table(t).count() === 1, "replayed epoch must not re-install")
    table.installStreamingEpoch("q1", 1, GraftDeliveries.rows(batch(2L)), table.installAppend)
    assert(spark.table(t).count() === 2)
    // an OLD epoch arriving late (post-restart replay) is also skipped
    table.installStreamingEpoch("q1", 0, GraftDeliveries.rows(batch(9L)), table.installAppend)
    assert(spark.table(t).count() === 2)
    // a different query's epoch 0 is its own ledger entry
    table.installStreamingEpoch("q2", 0, GraftDeliveries.rows(batch(3L)), table.installAppend)
    assert(spark.table(t).count() === 3)
  }

  test("Complete output mode replaces the table per epoch") {
    val src = freshTable("t_sink_agg_src")
    val dst = freshTable("t_sink_agg_dst")
    Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "v").writeTo(src).create()
    spark.sql(s"CREATE TABLE $dst (v STRING, n BIGINT)")
    val ckpt = tmpDir("ckpt-sink-agg")

    def recount(): Unit = {
      val q = spark.readStream.table(src)
        .groupBy($"v").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(dst)
      q.awaitTermination()
    }
    recount()
    assert(spark.table(dst).orderBy("v").as[(String, Long)].collect().toSeq
      === Seq(("x", 2L), ("y", 1L)))

    // new source rows → the next epoch REPLACES the counts (no stale or
    // duplicated rows — the truncate-per-epoch streaming write)
    spark.sql(s"INSERT INTO $src VALUES (4, 'y'), (5, 'z')")
    recount()
    assert(spark.table(dst).orderBy("v").as[(String, Long)].collect().toSeq
      === Seq(("x", 2L), ("y", 2L), ("z", 1L)))
  }
}
