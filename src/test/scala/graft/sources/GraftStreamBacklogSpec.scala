package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.unsafe.types.UTF8String

/** Catch-up at DEPTH (round 9, VERDICT task 7): a backlog of hundreds
  * of commits drains under `maxFilesPerTrigger` in bounded batches, and
  * the admission planner's cost is O(1) per commit AMORTIZED — measured
  * via the table's admission-visit counter, not assumed. This is the
  * 100 TB catch-up story for the streaming sources: a consumer that was
  * down for a week must not pay quadratic planning (or one giant batch)
  * to catch up. */
class GraftStreamBacklogSpec extends SparkSpec {
  import spark.implicits._

  test("a 300-commit backlog drains in <=cap-file batches with " +
      "amortized O(1) admission cost per commit") {
    val prevRetention = GraftTable.historyRetention
    GraftTable.historyRetention = 500
    try {
      spark.conf.set("spark.sql.catalog.graft_cat",
        classOf[GraftCatalog].getName)
      val t = "graft_cat.ns.t_backlog"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
      val table = GraftTableStore.tables((Seq("ns"), "t_backlog"))

      // 300 commits, one row each, installed driver-side (no Spark job
      // per commit — this is the backlog builder, not the system under
      // test)
      (1 to 300).foreach { i =>
        table.installAppend(Array(Array(
          new GenericInternalRow(Array[Any](i.toLong,
            UTF8String.fromString(s"r$i"))): InternalRow)))
      }
      assert(table.currentVersion === 300) // create = v0, appends 1..300

      val visits0 = table.admissionVisits.get()
      val batchSizes = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Long]())
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Long]())
      val q = spark.readStream
        .option("startingVersion", "0") // replay the LOG, not a snapshot
        .option("maxFilesPerTrigger", "10")
        .table(t)
        .writeStream
        .option("checkpointLocation", tmpDir("ckpt-backlog"))
        .foreachBatch { (df: DataFrame, _: Long) =>
          val ids = df.select("id").as[Long].collect()
          batchSizes.add(ids.length.toLong)
          ids.foreach(i => got.add(i))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      import scala.jdk.CollectionConverters._
      // exactly once, in commit order, all 300
      assert(got.asScala.toSeq === (1L to 300L),
        "the whole backlog must arrive exactly once, in log order")
      // bounded batches: never more than the cap, and genuinely many
      // batches (not one giant catch-up batch)
      val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
      assert(sizes.forall(_ <= 10),
        s"every batch must respect maxFilesPerTrigger: $sizes")
      assert(sizes.length >= 30,
        s"300 commits / cap 10 must drain over >=30 batches, " +
          s"got ${sizes.length}")

      // the measured planner-cost pin: admission examined each commit
      // ~once across the whole drain (plus one look-ahead per batch) —
      // NOT once per (commit x batch), which would be ~30x more
      val visits = table.admissionVisits.get() - visits0
      assert(visits <= 300L + 3L * sizes.length + 50L,
        s"admission must be amortized O(1) per commit: " +
          s"$visits visits for 300 commits over ${sizes.length} batches")
    } finally {
      GraftTable.historyRetention = prevRetention
    }
  }

  test("maxBytesPerTrigger bounds each micro-batch by added bytes, " +
      "whole commits, with the at-least-one progress guarantee") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val t = "graft_cat.ns.t_bytecap"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    val table = GraftTableStore.tables((Seq("ns"), "t_bytecap"))
    (1 to 12).foreach { i =>
      table.installAppend(Array(Array(
        new GenericInternalRow(Array[Any](i.toLong,
          UTF8String.fromString(s"r$i"))): InternalRow)))
    }
    val perFile = table.dataFiles.map(_.sizeBytes).max

    def drain(budget: String, ckpt: String): Seq[Long] = {
      val batchSizes = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Long]())
      val q = spark.readStream
        .option("startingVersion", "0")
        .option("maxBytesPerTrigger", budget)
        .table(t)
        .writeStream
        .option("checkpointLocation", tmpDir(ckpt))
        .foreachBatch { (df: DataFrame, _: Long) =>
          batchSizes.add(df.count())
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      batchSizes.asScala.toSeq.filter(_ > 0)
    }

    // budget of ~2 files per batch: drains in >=6 bounded batches,
    // exactly once in total, never more than 2 commits per batch
    val twoWide = drain((perFile * 2).toString, "ckpt-bytecap2")
    assert(twoWide.sum === 12L, s"exactly once: $twoWide")
    assert(twoWide.forall(_ <= 2L), s"2-file byte budget: $twoWide")
    assert(twoWide.length >= 6, s"bounded batches: $twoWide")

    // a budget SMALLER than any one commit still progresses: one
    // commit per batch (Delta's at-least-one contract), suffix syntax
    val starved = drain("1B", "ckpt-bytecap1")
    assert(starved.sum === 12L && starved.forall(_ === 1L),
      s"starved budget must advance one commit per batch: $starved")

    // a malformed size refuses loudly
    intercept[Exception](drain("lots", "ckpt-bytecap-bad"))
  }
}
