package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The commit-log consumption half of [[GraftTable]]: the streaming
  * micro-batch source (readStream.table tails appends from the commit
  * log — the Delta streaming-source contract: initial snapshot, then
  * per-commit appends, change commits fail unless skipped), the
  * `t$changes` change data feed (write-time CDC, multiset-cancelled to
  * the minimal row delta), and RESTORE as a forward-moving commit. */
class GraftStreamCdcSpec extends SparkSpec {
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

  /** Run one Trigger.AvailableNow pass of `readStream.table(t)` into a
    * collecting sink; returns the rows delivered by THIS pass. */
  private def drainOnce(t: String, checkpoint: String,
                        options: Map[String, String] = Map.empty)
      : Seq[(Long, String)] = {
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String)]())
    var reader = spark.readStream
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.table(t)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("id", "v").as[(Long, String)].collect()
          .foreach(got.add)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("streaming tail: initial snapshot, then appends exactly once " +
      "across checkpointed restarts") {
    val t = freshTable("t_stream")
    val ckpt = tmpDir("ckpt-stream")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").writeTo(t).create()  // v1
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")                   // v2

    // pass 1: both pre-stream commits arrive (as the initial snapshot)
    val p1 = drainOnce(t, ckpt)
    assert(p1.sorted === Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // no new commits → a second pass delivers nothing
    assert(drainOnce(t, ckpt).isEmpty)

    // two more commits, then a checkpointed restart: exactly the new
    // rows, exactly once — the offset log carried the position
    spark.sql(s"INSERT INTO $t VALUES (4, 'd')")                   // v3
    spark.sql(s"INSERT INTO $t VALUES (5, 'e')")                   // v4
    val p3 = drainOnce(t, ckpt)
    assert(p3.sorted === Seq((4L, "d"), (5L, "e")))
  }

  test("change commits fail the stream; skipChangeCommits skips them; " +
      "layout commits stream nothing") {
    val t = freshTable("t_stream_chg")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(1).writeTo(t).create()                          // v1
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")                   // v2
    spark.sql(s"UPDATE $t SET v = 'B' WHERE id = 2")               // v3: change
    spark.sql(s"INSERT INTO $t VALUES (4, 'd')")                   // v4

    // replay from the log start hits the change commit and fails loudly
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce(t, tmpDir("ckpt-chg-fail"), Map("startingVersion" -> "1"))
    }
    assert(ex.getCause.getMessage.contains("skipChangeCommits"),
      s"unexpected failure: ${ex.getCause}")

    // with skipChangeCommits the UPDATE commit is skipped WHOLE; the
    // appends around it still arrive
    val got = drainOnce(t, tmpDir("ckpt-chg-skip"),
      Map("startingVersion" -> "1", "skipChangeCommits" -> "true"))
    assert(got.sorted === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // OPTIMIZE records zero row changes → an already-caught-up stream
    // (initial snapshot mode) sees nothing from it
    val ckpt = tmpDir("ckpt-chg-layout")
    assert(drainOnce(t, ckpt).nonEmpty) // snapshot pass
    GraftMaintenance.optimize(Seq("ns"), "t_stream_chg")
    assert(drainOnce(t, ckpt).isEmpty,
      "a layout-only OPTIMIZE commit must stream no rows")
  }

  test("startingVersion replays from a retained commit; 'latest' tails " +
      "only post-stream appends") {
    val t = freshTable("t_stream_sv")
    Seq((1L, "a")).toDF("id", "v").writeTo(t).create()             // v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")                   // v2
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")                   // v3

    // replay from v3 only
    assert(drainOnce(t, tmpDir("ckpt-sv3"),
      Map("startingVersion" -> "3")).sorted === Seq((3L, "c")))

    // 'latest': first pass delivers nothing, appends after it do arrive
    val ckpt = tmpDir("ckpt-svl")
    assert(drainOnce(t, ckpt, Map("startingVersion" -> "latest")).isEmpty)
    spark.sql(s"INSERT INTO $t VALUES (4, 'd')")
    assert(drainOnce(t, ckpt,
      Map("startingVersion" -> "latest")).sorted === Seq((4L, "d")))

    // startingTimestamp: replay from the earliest commit at or after the
    // instant (commit timestamps pinned through the test clock)
    val savedClock = GraftClock.nowMicros
    try {
      val base = 1719792000L * 1000000L // 2024-07-01 00:00:00 UTC
      var now = base
      GraftClock.nowMicros = () => now
      val tt = freshTable("t_stream_ts")
      Seq((1L, "a")).toDF("id", "v").writeTo(tt).create()   // @base
      now = base + 3600L * 1000000L
      spark.sql(s"INSERT INTO $tt VALUES (2, 'b')")          // @+1h
      now = base + 7200L * 1000000L
      spark.sql(s"INSERT INTO $tt VALUES (3, 'c')")          // @+2h
      assert(drainOnce(tt, tmpDir("ckpt-ts"),
        Map("startingTimestamp" -> "2024-07-01 00:30:00")).sorted
        === Seq((2L, "b"), (3L, "c")))
      // a future instant = only-new-data
      assert(drainOnce(tt, tmpDir("ckpt-ts2"),
        Map("startingTimestamp" -> "2030-01-01 00:00:00")).isEmpty)
    } finally GraftClock.nowMicros = savedClock

    // a retired offset fails loudly instead of silently skipping log
    val saved = GraftTable.historyRetention
    try {
      GraftTable.historyRetention = 2
      for (i <- 10 to 16) spark.sql(s"INSERT INTO $t VALUES ($i, 'x')")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        drainOnce(t, tmpDir("ckpt-sv-retired"), Map("startingVersion" -> "1"))
      }
      assert(ex.getCause.getMessage.contains("retired"),
        s"unexpected failure: ${ex.getCause}")
    } finally GraftTable.historyRetention = saved
  }

  test("maxFilesPerTrigger bounds each micro-batch to whole commits; " +
      "the backlog drains in order, exactly once") {
    val t = freshTable("t_stream_rate")
    val ckpt = tmpDir("ckpt-rate")
    Seq((1L, "a")).toDF("id", "v").repartition(1).writeTo(t).create() // v1
    for (i <- 2 to 5)
      spark.sql(s"INSERT INTO $t VALUES ($i, 'x$i')") // v2..v5, 1 file each

    // tail from the log start, one file per trigger → one commit per
    // batch; AvailableNow drains the whole backlog through the cap
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Seq[Long]]())
    val q = spark.readStream
      .option("startingVersion", "1")
      .option("maxFilesPerTrigger", "1")
      .table(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("id").as[Long].collect().toSeq.sorted
        if (ids.nonEmpty) { batches.add(ids); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toSeq
    assert(got.flatten === Seq(1L, 2L, 3L, 4L, 5L),
      s"backlog must drain in order exactly once: $got")
    assert(got.length === 5 && got.forall(_.length === 1),
      s"one single-file commit per batch under the cap: $got")
  }

  test("t$changes: write-time CDC, multiset-cancelled to the minimal " +
      "row delta; version-range reads skip other commits' files") {
    val t = freshTable("t_cdc")
    spark.sql(
      s"CREATE TABLE $t (id BIGINT, h INT, v STRING) PARTITIONED BY (h)")
    spark.sql(s"INSERT INTO $t VALUES (1, 0, 'a'), (2, 0, 'b'), " +
      "(3, 1, 'c'), (4, 1, 'd')")                                  // v1
    spark.sql(s"UPDATE $t SET v = 'B' WHERE h = 0 AND id = 2")     // v2
    spark.sql(s"DELETE FROM $t WHERE h = 1")                       // v3 (metadata)

    val ch = spark.table(s"graft_cat.ns.`t_cdc$$changes`")
      .select("_change_type", "_commit_version", "id", "v")
      .as[(String, Int, Long, String)].collect().toSeq

    // v1: pure inserts
    assert(ch.filter(_._2 == 1).toSet === Set(
      ("insert", 1, 1L, "a"), ("insert", 1, 2L, "b"),
      ("insert", 1, 3L, "c"), ("insert", 1, 4L, "d")))
    // v2: the COW rewrite carried the whole h=0 group, but the unchanged
    // row (1,'a') CANCELS — the feed holds exactly the updated row's
    // preimage delete + postimage insert
    assert(ch.filter(_._2 == 2).toSet === Set(
      ("delete", 2, 2L, "b"), ("insert", 2, 2L, "B")))
    // v3: the metadata partition drop records its deletes
    assert(ch.filter(_._2 == 3).toSet === Set(
      ("delete", 3, 3L, "c"), ("delete", 3, 4L, "d")))

    // one file per commit + zone maps on _commit_version → a version-
    // range read skips the other commits' files through the real scan
    val cdcTable = GraftTableStore.tables((Seq("ns"), "t_cdc")).changesMetaTable
    assert(cdcTable.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .isInstanceOf[GraftScanBuilder])
    val n = spark.table(s"graft_cat.ns.`t_cdc$$changes`")
      .filter($"_commit_version" === 2).count()
    assert(n === 2)
  }

  test("OPTIMIZE and ALTER TABLE record no CDC rows; operation lands in " +
      "t$history") {
    val t = freshTable("t_cdc_layout")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2).writeTo(t).create()                          // v1
    GraftMaintenance.optimize(Seq("ns"), "t_cdc_layout", 100)      // v2
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w STRING)")            // v3

    val ch = spark.table(s"graft_cat.ns.`t_cdc_layout$$changes`")
      .select("_commit_version").as[Int].collect().toSeq
    assert(ch.forall(_ == 1),
      s"layout commits must record zero changes, got versions $ch")

    val ops = spark.table(s"graft_cat.ns.`t_cdc_layout$$history`")
      .orderBy("version").select("operation").as[String].collect().toSeq
    assert(ops === Seq("UNKNOWN", "APPEND", "OPTIMIZE", "ALTER TABLE"))
  }

  test("streaming change data feed: t$changes is tailable — change " +
      "commits arrive as consumable deltas, exactly once") {
    val t = freshTable("t_cdf_stream")
    val ckpt = tmpDir("ckpt-cdf")
    spark.sql(
      s"CREATE TABLE $t (id BIGINT, h INT, v STRING) PARTITIONED BY (h)")
    spark.sql(s"INSERT INTO $t VALUES (1, 0, 'a'), (2, 0, 'b'), (3, 1, 'c')")
    spark.sql(s"UPDATE $t SET v = 'B' WHERE h = 0 AND id = 2")

    def drain(): Seq[(String, Int, Long, String)] = {
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, Int, Long, String)]())
      val q = spark.readStream
        .table(s"graft_cat.ns.`t_cdf_stream$$changes`")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("_change_type", "_commit_version", "id", "v")
            .as[(String, Int, Long, String)].collect().foreach(got.add)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq
    }

    // initial replay: every retained commit's minimal delta — including
    // the UPDATE, which a plain streaming read would refuse
    val p1 = drain()
    assert(p1.toSet === Set(
      ("insert", 1, 1L, "a"), ("insert", 1, 2L, "b"), ("insert", 1, 3L, "c"),
      ("delete", 2, 2L, "b"), ("insert", 2, 2L, "B")))

    // caught up → nothing
    assert(drain().isEmpty)

    // a delete commit arrives as its deltas on the checkpointed tail
    spark.sql(s"DELETE FROM $t WHERE h = 1")
    assert(drain().toSet === Set(("delete", 3, 3L, "c")))
  }

  test("a WAP publish arrives on the streaming change feed as exactly " +
      "the audited delta — the read-through REPLACE TABLE cannot give") {
    val t = freshTable("t_pub_stream")
    val ckpt = tmpDir("ckpt-pub")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").writeTo(t).create() // v1
    def drain(): Seq[(String, Int, Long, String)] = {
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, Int, Long, String)]())
      val q = spark.readStream
        .table(s"graft_cat.ns.`t_pub_stream$$changes`")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("_change_type", "_commit_version", "id", "v")
            .as[(String, Int, Long, String)].collect().foreach(got.add)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq
    }
    assert(drain().toSet === Set(
      ("insert", 1, 1L, "a"), ("insert", 1, 2L, "b")))

    // write-audit on the stage; prod's tail sees nothing meanwhile
    spark.sql("DROP TABLE IF EXISTS graft_cat.ns.t_pub_stage")
    GraftMaintenance.sql(spark, "CREATE TABLE graft_cat.ns.t_pub_stage " +
      "SHALLOW CLONE graft_cat.ns.t_pub_stream").collect()
    spark.sql("INSERT INTO graft_cat.ns.t_pub_stage VALUES (3, 'c')")
    spark.sql("DELETE FROM graft_cat.ns.t_pub_stage WHERE id = 1")
    assert(drain().isEmpty, "stage writes must not leak onto prod's feed")

    // the publish lands as ONE commit whose delta is the audited change
    // set — the carried-through row (2,'b') cancels in the reference
    // diff and never re-delivers
    GraftMaintenance.sql(spark,
      "CREATE OR REPLACE TABLE graft_cat.ns.t_pub_stream " +
        "SHALLOW CLONE graft_cat.ns.t_pub_stage").collect()
    assert(drain().toSet === Set(
      ("delete", 2, 1L, "a"), ("insert", 2, 3L, "c")))
  }

  test("RESTORE resets state as a forward commit: data reverts, history " +
      "advances, CDC records the delta") {
    val t = freshTable("t_restore")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .writeTo(t).create()                                         // v1
    spark.sql(s"INSERT INTO $t VALUES (4, 'd'), (5, 'e')")         // v2
    GraftMaintenance.restore(Seq("ns"), "t_restore", version = 1)  // v3

    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // history moved FORWARD: the undone v2 is still readable
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 2")
      .as[Long].head() === 5)
    val hist = store("t_restore").commitHistory.map(_._1)
    assert(hist === Seq(0, 1, 2, 3))
    // shared files diff by reference → the CDC delta is exactly the
    // un-appended rows
    val ch = spark.table(s"graft_cat.ns.`t_restore$$changes`")
      .filter($"_commit_version" === 3)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq
    assert(ch.toSet === Set(("delete", 4L), ("delete", 5L)))
    // restoring across a schema change is refused
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w STRING)")            // v4
    intercept[UnsupportedOperationException] {
      GraftMaintenance.restore(Seq("ns"), "t_restore", version = 1)
    }
  }
}
