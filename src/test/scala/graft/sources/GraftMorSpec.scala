package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Merge-on-read row-level operations: tables created with
  * `write.rowlevel.mode = merge-on-read` serve DELETE/UPDATE/MERGE
  * through Spark's delta-based rewrite (`SupportsDelta`) — deletes fold
  * into per-file DELETE VECTORS addressed by the `_file_id`/`_row_pos`
  * metadata columns, touched files are NEVER rewritten, and update
  * postimages/inserts append as new files. At 100 TB this is the
  * difference between "update = rewrite a partition" (COW) and
  * "update = a bitmap plus the new rows" (MOR). */
class GraftMorSpec extends SparkSpec {
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

  private def identitySet(rows: Array[org.apache.spark.sql.catalyst.InternalRow]) = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.sql.catalyst.InternalRow,
        java.lang.Boolean]())
    rows.foreach(s.add)
    s
  }

  private def createMor(name: String): String = {
    val t = freshTable(name)
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      s"TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read')")
    t
  }

  test("MOR DELETE: rows vanish via a delete vector, the file is NOT " +
      "rewritten; CDC records the preimages") {
    val t = createMor("t_mor_del")
    Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    val table = store("t_mor_del")
    val beforeFiles = table.dataFiles
    val beforeRows = identitySet(beforeFiles.head.rows)

    spark.sql(s"DELETE FROM $t WHERE id % 3 = 0") // ids 0,3,6,9
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq(1L, 2L, 4L, 5L, 7L, 8L).map(i => (i, s"v$i")))

    // the file survived BY IDENTITY — no rewrite happened
    val afterFiles = table.dataFiles
    assert(afterFiles.length === 1)
    assert(afterFiles.head eq beforeFiles.head,
      "MOR delete must not rewrite the data file")
    assert(afterFiles.head.rows.forall(beforeRows.contains))
    assert(table.dvCensus === Seq((0, 4)))

    // history + CDC
    val ops = spark.table(s"graft_cat.ns.`t_mor_del$$history`")
      .orderBy("version").select("operation").as[String].collect().toSeq
    assert(ops.last === "DELETE")
    val ch = spark.table(s"graft_cat.ns.`t_mor_del$$changes`")
      .filter($"_change_type" === "delete")
      .select("id").as[Long].collect().toSeq.sorted
    assert(ch === Seq(0L, 3L, 6L, 9L))

    // a SECOND delete through the same vector (addresses skip already-
    // dead positions, never renumber)
    spark.sql(s"DELETE FROM $t WHERE id = 4")
    assert(spark.table(t).count() === 5)
    assert(table.dvCensus === Seq((0, 5)))
    assert(table.dataFiles.head eq beforeFiles.head)
  }

  test("MOR UPDATE: delete vector + appended postimage file; reads and " +
      "minimal CDC exact") {
    val t = createMor("t_mor_upd")
    Seq.tabulate(6)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    val table = store("t_mor_upd")
    val base = table.dataFiles.head

    spark.sql(s"UPDATE $t SET v = concat(v, '!') WHERE id >= 4")
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((0L, "v0"), (1L, "v1"), (2L, "v2"), (3L, "v3"),
        (4L, "v4!"), (5L, "v5!")))
    // base file intact + DV over the two old positions + appended
    // postimage files (one per writer task that carried rows)
    assert(table.dataFiles.head eq base)
    assert(table.dataFiles.length >= 2)
    assert(table.dataFiles.drop(1).map(_.rowCount).sum === 2,
      "appended files must hold exactly the two postimages")
    assert(table.dvCensus === Seq((0, 2)))
    val ch = spark.table(s"graft_cat.ns.`t_mor_upd$$changes`")
      .filter($"_commit_version" === 2)
      .select("_change_type", "id", "v").as[(String, Long, String)]
      .collect().toSet
    assert(ch === Set(("delete", 4L, "v4"), ("delete", 5L, "v5"),
      ("insert", 4L, "v4!"), ("insert", 5L, "v5!")))
  }

  test("MOR MERGE: matched update + unmatched insert through the delta " +
      "write; time travel sees every state") {
    val t = createMor("t_mor_merge")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1).writeTo(t).append()                          // v1
    Seq((2L, "B"), (9L, "Z")).toDF("id", "v")
      .createOrReplaceTempView("mor_src")
    spark.sql(
      s"""MERGE INTO $t g USING mor_src s ON g.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |""".stripMargin)                                         // v2
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
    val table = store("t_mor_merge")
    assert(table.dvCensus === Seq((0, 1)))
    // pre-merge state is still served
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").orderBy("id")
      .as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("OPTIMIZE purges delete vectors; aggregate pushdown declines on " +
      "DV'd files (counts stay exact)") {
    val t = createMor("t_mor_opt")
    Seq.tabulate(8)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id < 2")
    val table = store("t_mor_opt")
    assert(table.dvCensus.nonEmpty)

    // count(*) must NOT be answered from raw file stats (they overcount
    // the dead positions): the scan reads real rows and stays exact
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() === 6)
    assert(table.lastScanCensus.get.rowsRead === 6,
      s"DV'd table must not serve stats-only counts: ${table.lastScanCensus}")

    // compaction rewrites live rows and drops the vectors
    GraftMaintenance.optimize(Seq("ns"), "t_mor_opt", targetRows = 1 << 20)
    assert(table.dvCensus.isEmpty, "OPTIMIZE must purge delete vectors")
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === (2L to 7L).map(i => (i, s"v$i")))
    // with vectors gone, stats answer again
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() === 6)
    assert(table.lastScanCensus.get.rowsRead === 0,
      "post-purge count should be metadata-only again")
  }

  test("the MOR rewrite's own scan zone-skips: a selective DELETE reads " +
      "only the covering files") {
    val t = createMor("t_mor_skip")
    // four single-task appends with disjoint id ranges -> four files
    for (base <- Seq(0, 10, 20, 30))
      Seq.tabulate(10)(i => (base + i.toLong, s"v${base + i}")).toDF("id", "v")
        .repartition(1).writeTo(t).append()
    val table = store("t_mor_skip")
    assert(table.dataFiles.length === 4)

    // the DELETE condition pushes into the delta rewrite's scan, so only
    // the file whose zone envelope covers [12, 18] is read at all
    spark.sql(s"DELETE FROM $t WHERE id BETWEEN 12 AND 18")
    val census = table.lastScanCensus.get
    assert(census.filesRead === 1,
      s"the rewrite scan must zone-skip the other three files: $census")
    assert(spark.table(t).count() === 33)
    assert(table.dvCensus === Seq((1, 7)))
  }

  test("MOR deletes are change commits to a plain stream but consumable " +
      "deltas on the CDF stream") {
    val t = createMor("t_mor_stream")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id = 1")

    // plain tail from the log start refuses the MOR delete commit
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream
        .option("startingVersion", "1").table(t)
        .writeStream
        .option("checkpointLocation", tmpDir("ckpt-mor-fail"))
        .format("memory").queryName("mor_plain")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(ex.getCause.getMessage.contains("skipChangeCommits"))

    // the CDF stream serves it as data
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Long)]())
    val q = spark.readStream.table(s"graft_cat.ns.`t_mor_stream$$changes`")
      .writeStream
      .option("checkpointLocation", tmpDir("ckpt-mor-cdf"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("_change_type", "id").as[(String, Long)]
          .collect().foreach(got.add)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === Set(("insert", 1L), ("insert", 2L),
      ("delete", 1L)))
  }

  test("cloning a MOR table records the LIVE rows in the clone's change " +
      "feed — dead positions never resurface as inserts") {
    val t = createMor("t_mor_clonecdc")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ns.t_mor_clonecdc2")
    GraftMaintenance.cloneTable(Seq("ns"), "t_mor_clonecdc",
      Seq("ns"), "t_mor_clonecdc2")
    val ch = spark.table(s"graft_cat.ns.`t_mor_clonecdc2$$changes`")
      .select("_change_type", "id").as[(String, Long)].collect().toSeq
    assert(ch.toSet === Set(("insert", 1L), ("insert", 3L)),
      s"the clone's feed must hold only live rows: $ch")
    // a plain stream replaying the clone's log sees the same live view
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream.option("startingVersion", "1")
      .table("graft_cat.ns.t_mor_clonecdc2")
      .writeStream
      .option("checkpointLocation", tmpDir("ckpt-clonecdc"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").as[Long].collect().foreach(got.add)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted === Seq(1L, 3L))
  }

  test("optimistic concurrency: a rewrite between scan and commit " +
      "aborts; a lost update aborts; a duplicate delete folds") {
    val t = createMor("t_mor_occ")
    for (i <- 0 until 2)
      Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(1)
        .writeTo(t).append() // two small files → OPTIMIZE rewrites them
    val table = store("t_mor_occ")
    val staleBase = table.dataFiles

    // a concurrent OPTIMIZE rebuilds the files: addresses minted against
    // the old vector must abort, not delete whatever now sits there
    GraftMaintenance.optimize(Seq("ns"), "t_mor_occ", targetRows = 1 << 20)
    intercept[java.util.ConcurrentModificationException] {
      table.installDelta(Array((0, 0)), Array.empty[Array[org.apache.spark.sql.catalyst.InternalRow]], "DELETE", staleBase)
    }
    assert(spark.table(t).count() === 2, "the aborted delete must not land")

    // lost update: the position an UPDATE read gets deleted concurrently
    val base2 = table.dataFiles
    val pos = spark.sql(s"SELECT _row_pos FROM $t WHERE id = 0")
      .as[Int].head()
    table.installDelta(Array((0, pos)), Array.empty[Array[org.apache.spark.sql.catalyst.InternalRow]], "DELETE", base2)
    assert(spark.table(t).count() === 1)
    intercept[java.util.ConcurrentModificationException] {
      table.installDelta(Array((0, pos)), Array.empty[Array[org.apache.spark.sql.catalyst.InternalRow]], "UPDATE", base2)
    }
    // ... but the same re-delivered DELETE folds idempotently
    table.installDelta(Array((0, pos)), Array.empty[Array[org.apache.spark.sql.catalyst.InternalRow]], "DELETE", base2)
    assert(spark.table(t).count() === 1)
  }

  test("mode surfaces: property reported, bad mode rejected, clone " +
      "preserves vectors and mode") {
    val t = createMor("t_mor_meta")
    assert(store("t_mor_meta").properties()
      .get("write.rowlevel.mode") === "merge-on-read")
    intercept[Exception](spark.sql(
      "CREATE TABLE graft_cat.ns.t_mor_bad (id BIGINT) " +
        "TBLPROPERTIES ('write.rowlevel.mode'='sideways')"))

    Seq.tabulate(4)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ns.t_mor_clone")
    GraftMaintenance.cloneTable(Seq("ns"), "t_mor_meta",
      Seq("ns"), "t_mor_clone")
    // the clone adopted the file AND its delete vector
    assert(spark.table("graft_cat.ns.t_mor_clone").orderBy("id")
      .as[(Long, String)].collect().toSeq
      === Seq((0L, "v0"), (1L, "v1"), (3L, "v3")))
    assert(store("t_mor_clone").rowLevelMode === "merge-on-read")
    // divergence: deleting in the clone leaves the source intact
    spark.sql("DELETE FROM graft_cat.ns.t_mor_clone WHERE id = 0")
    assert(spark.table("graft_cat.ns.t_mor_clone").count() === 2)
    assert(spark.table(t).count() === 3)
  }
}
