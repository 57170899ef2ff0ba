package graft.sources

import graft.SparkSpec

/** The durable lakehouse tier (round 9): tables created through a
  * warehouse-backed catalog persist as parquet segments + a JSON commit
  * log and OUTLIVE the JVM — a fresh catalog instance pointed at the
  * same path serves the data, the retained history (time travel), and
  * the change data feed written before it. VACUUM physically reclaims
  * bytes; COW rewrites never read untouched partitions' segments.
  *
  * Mirrors the durability the reference's platform gives its Delta
  * tables (Notebooks/Batch_Bronze_to_Silver.Notebook/
  * notebook-content.py:200 `saveAsTable`) — data files + transaction
  * log on storage, not JVM heap. */
class GraftDurableSpec extends SparkSpec {
  import spark.implicits._

  /** Register a durable catalog over `dir` under `name`; `isolated`
    * simulates a separate process (private store, log replayed). */
  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  test("a restarted catalog serves data, time travel and the change " +
      "feed from the on-disk log") {
    val wh = tmpDir("graft-dur-restart")
    durableCatalog("dwh", wh)
    spark.sql("CREATE TABLE dwh.ns.m (id BIGINT, state STRING, aqi INT) " +
      "PARTITIONED BY (state)")
    spark.sql("INSERT INTO dwh.ns.m VALUES (1, 'CA', 40), (2, 'TX', 55)")
    spark.sql("INSERT INTO dwh.ns.m VALUES (3, 'CA', 61)")
    spark.sql("UPDATE dwh.ns.m SET aqi = 70 WHERE id = 2")

    // the on-disk layout is real: log entries + parquet segments
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()
    assert(java.nio.file.Files.list(tableDir.resolve("log")).count() >= 4)
    assert(java.nio.file.Files.list(tableDir.resolve("data"))
      .filter(_.toString.endsWith(".parquet")).count() >= 3)

    // "restart": an ISOLATED catalog over the same path — a private
    // store whose state comes exclusively from the log replay
    durableCatalog("dwh2", wh, isolated = true)
    assert(spark.sql("SELECT id, state, aqi FROM dwh2.ns.m ORDER BY id")
      .as[(Long, String, Int)].collect().toSeq ===
      Seq((1L, "CA", 40), (2L, "TX", 70), (3L, "CA", 61)))

    // time travel across the restart (v1 = after the first insert)
    assert(spark.sql("SELECT id FROM dwh2.ns.m VERSION AS OF 1 ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))

    // the change data feed reconstructs from the log's CDC records:
    // the UPDATE's preimage delete + postimage insert survive restart
    val ch = spark.sql(
      "SELECT _change_type, id, aqi FROM dwh2.ns.`m$changes` " +
        "WHERE _commit_version = 3 ORDER BY _change_type, id")
      .as[(String, Long, Int)].collect().toSeq
    assert(ch === Seq(("delete", 2L, 55), ("insert", 2L, 70)),
      "the UPDATE's minimal row delta must survive the restart")

    // zone maps survive too: a selective scan still skips files
    val table = spark.sessionState.catalogManager.catalog("dwh")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "m"))
    spark.sql("SELECT * FROM dwh.ns.m WHERE state = 'TX'").collect()
    val census = table.lastScanCensus.get
    assert(census.filesRead < census.filesTotal,
      s"zone maps must prune the CA files: $census")
  }

  test("a COW UPDATE touching one partition group never opens the " +
      "other groups' segments") {
    val wh = tmpDir("graft-dur-cow")
    durableCatalog("dcow", wh)
    spark.sql("CREATE TABLE dcow.ns.part (id BIGINT, p INT, v STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO dcow.ns.part VALUES " +
      "(1, 1, 'a'), (2, 1, 'b'), (3, 2, 'c'), (4, 2, 'd'), (5, 3, 'e')")
    val table = spark.sessionState.catalogManager.catalog("dcow")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "part"))
    // all segments are spilled (strong refs dropped at persist); reset
    // visibility: count reads per group from here on
    val byGroup = table.dataFiles.groupBy(_.groupKey.get.head)
    assert(byGroup.keySet === Set(1, 2, 3))
    def readsOf(g: Int): Long =
      byGroup(g).map(_.segment.reads).sum

    val before = Map(1 -> readsOf(1), 2 -> readsOf(2), 3 -> readsOf(3))
    // force the next reads to disk (the spill keeps a soft cache; this
    // is what GC pressure does) — the census below counts real opens
    table.dataFiles.foreach(_.evict())
    spark.sql("UPDATE dcow.ns.part SET v = 'A' WHERE p = 1 AND id = 1")
    assert(readsOf(2) === before(2) && readsOf(3) === before(3),
      "untouched partition groups' segments must never be opened by " +
        "the rewrite (file-level runtime group filter)")
    assert(readsOf(1) > before(1),
      "the touched group must have been read (sanity)")

    // and the rewrite was correct
    assert(spark.sql("SELECT v FROM dcow.ns.part ORDER BY id")
      .as[String].collect().toSeq === Seq("A", "b", "c", "d", "e"))
  }

  test("VACUUM physically deletes unreferenced segments; retired " +
      "version reads fail loudly; live reads are unaffected") {
    val wh = tmpDir("graft-dur-vac")
    durableCatalog("dvac", wh)
    spark.sql("CREATE TABLE dvac.ns.v (id BIGINT, s STRING)")
    spark.sql("INSERT INTO dvac.ns.v VALUES (1, 'one')")
    spark.sql("INSERT INTO dvac.ns.v VALUES (2, 'two')")
    // OVERWRITE strands the first two segments in history only; the
    // follow-up insert pushes the overwrite's CDC record (which still
    // references them as preimages) out of the retained window too
    spark.sql("INSERT OVERWRITE dvac.ns.v VALUES (9, 'nine')")
    spark.sql("INSERT INTO dvac.ns.v VALUES (10, 'ten')")
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()
    def segCount: Long = java.nio.file.Files.list(tableDir.resolve("data"))
      .filter(_.toString.endsWith(".parquet")).count()
    def logCount: Long = java.nio.file.Files.list(tableDir.resolve("log"))
      .filter(_.toString.endsWith(".json")).count()
    val (segsBefore, logsBefore) = (segCount, logCount)
    assert(segsBefore >= 3, s"expected stranded segments, got $segsBefore")

    val retired = GraftMaintenance.sql(spark,
      "VACUUM dvac.ns.v RETAIN 1 SNAPSHOTS").collect().head.getInt(0)
    assert(retired === 4, s"expected 4 retired snapshots, got $retired")
    assert(segCount < segsBefore,
      "VACUUM must physically delete unreferenced segment files")
    assert(logCount < logsBefore,
      "VACUUM must physically delete retired log entries")

    // live reads unaffected — including from a fresh replay of the log
    assert(spark.sql("SELECT id FROM dvac.ns.v ORDER BY id")
      .as[Long].collect().toSeq === Seq(9L, 10L))
    durableCatalog("dvac2", wh, isolated = true)
    assert(spark.sql("SELECT id FROM dvac2.ns.v ORDER BY id")
      .as[Long].collect().toSeq === Seq(9L, 10L))

    // retired versions fail loudly, not silently empty
    val e = intercept[Exception](
      spark.sql("SELECT * FROM dvac.ns.v VERSION AS OF 1").collect())
    assert(e.getMessage.contains("retired") ||
      e.getMessage.contains("no version"),
      s"retired version must fail loudly: ${e.getMessage}")
  }

  test("schema evolution, constraints and field ids survive restart") {
    val wh = tmpDir("graft-dur-evolve")
    durableCatalog("devo", wh)
    spark.sql("CREATE TABLE devo.ns.e (id BIGINT, a STRING)")
    spark.sql("INSERT INTO devo.ns.e VALUES (1, 'x')")
    spark.sql("ALTER TABLE devo.ns.e RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE devo.ns.e ADD COLUMN a STRING")
    spark.sql("ALTER TABLE devo.ns.e SET TBLPROPERTIES " +
      "('constraints.pos' = 'id > 0')")

    durableCatalog("devo2", wh, isolated = true)
    // renamed column serves its values (field-id matching down to the
    // parquet segment); the re-added a is NULL, never b's values
    assert(spark.sql("SELECT id, b, a FROM devo2.ns.e")
      .as[(Long, String, Option[String])].collect().toSeq ===
      Seq((1L, "x", None)))
    // the constraint replayed from the log still blocks violating rows
    val e = intercept[Exception](
      spark.sql("INSERT INTO devo2.ns.e VALUES (-5, 'bad', NULL)"))
    assert(e.getMessage.contains("pos") || e.getMessage.contains("CHECK") ||
      Option(e.getCause).exists(c => c.getMessage.contains("pos")),
      s"restart must keep CHECK enforcement: ${e.getMessage}")
    // a fresh ADD COLUMN after restart must mint a NEW field id, not
    // reuse a dropped/renamed one (the counter rides the log)
    spark.sql("ALTER TABLE devo2.ns.e ADD COLUMN c INT")
    val t2 = spark.sql("SELECT * FROM devo2.ns.e").schema
    val ids = t2.fields.flatMap(f =>
      if (f.metadata.contains("graft.field.id"))
        Some(f.metadata.getLong("graft.field.id")) else None)
    assert(ids.distinct.length === ids.length,
      s"field ids must stay unique after restart: ${ids.toSeq}")
  }

  test("ADD COLUMN on a durable table is METADATA-ONLY: no segment is " +
      "rewritten, old rows read NULL, and the layout survives restart") {
    val wh = tmpDir("graft-dur-addcol")
    durableCatalog("dac", wh)
    spark.sql("CREATE TABLE dac.ns.a (id BIGINT, p INT, v STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO dac.ns.a VALUES (1, 0, 'x'), (2, 1, 'y')")

    import scala.jdk.CollectionConverters._
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(q => java.nio.file.Files.isRegularFile(q.resolve("table.json")))
      .findFirst().orElseThrow()
    def segCensus: Map[String, java.nio.file.attribute.FileTime] =
      java.nio.file.Files.list(tableDir.resolve("data")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p)).toMap
    val before = segCensus

    spark.sql("ALTER TABLE dac.ns.a ADD COLUMN extra INT")

    // the DDL cost a log entry, never a byte of data: the exact same
    // segment files, untouched
    assert(segCensus === before,
      "metadata-only ADD COLUMN must not write or rewrite any segment")

    // old rows read NULL in the new column; new rows carry values
    spark.sql("INSERT INTO dac.ns.a VALUES (3, 0, 'z', 7)")
    assert(spark.sql("SELECT id, extra FROM dac.ns.a ORDER BY id")
      .as[(Long, Option[Int])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(7))))
    // filters over the new column still work (zone-less old files scan)
    assert(spark.sql(
      "SELECT id FROM dac.ns.a WHERE extra = 7").as[Long].head() === 3L)

    // restart serves the same widened layout from the log
    durableCatalog("dac2", wh, isolated = true)
    assert(spark.sql("SELECT id, extra FROM dac2.ns.a ORDER BY id")
      .as[(Long, Option[Int])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(7))))
    // a COW UPDATE across the mixed-width files stays correct
    spark.sql("UPDATE dac.ns.a SET extra = 9 WHERE id = 1")
    assert(spark.sql("SELECT id, extra FROM dac.ns.a ORDER BY id")
      .as[(Long, Option[Int])].collect().toSeq ===
      Seq((1L, Some(9)), (2L, None), (3L, Some(7))))
  }

  test("introspection parity: t$files / t$history / t$detail serve " +
      "identical output before and after restart") {
    val wh = tmpDir("graft-dur-meta")
    durableCatalog("dmw", wh)
    spark.sql("CREATE TABLE dmw.ns.t (id BIGINT, p INT, v STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO dmw.ns.t VALUES (1, 0, 'a'), (2, 1, 'b')")
    spark.sql("INSERT INTO dmw.ns.t VALUES (3, 0, 'c')")
    spark.sql("UPDATE dmw.ns.t SET v = 'B' WHERE id = 2")

    def dump(cat: String): Seq[Seq[String]] =
      Seq("files", "history", "detail").map { m =>
        spark.table(s"$cat.ns.`t$$$m`")
          .collect().map(_.toString).sorted.toSeq
      }
    val before = dump("dmw")
    assert(before.forall(_.nonEmpty))

    durableCatalog("dmr", wh, isolated = true)
    val after = dump("dmr")
    assert(after === before,
      "the replayed log must reconstruct the metadata surface exactly")
  }

  test("CLONE REPLACE re-points a shallow clone; vacuuming the source " +
      "no longer invalidates it") {
    val wh = tmpDir("graft-dur-clone")
    durableCatalog("dcl", wh)
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE dcl.ns.clsrc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dcl.ns.clsrc VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    // two shallow clones of the same snapshot: both serve by reference
    GraftMaintenance.cloneTable(Seq("ns"), "clsrc", Seq("ns"), "cl_deep")
    GraftMaintenance.cloneTable(Seq("ns"), "clsrc", Seq("ns"), "cl_shallow")
    assert(spark.table("graft_cat.ns.cl_deep").count() === 3)

    // the source moves on; after the FOLLOW-UP commit retires the
    // overwrite's CDC record from the retained window, its old segments
    // are live only via the clones' references
    spark.sql("INSERT OVERWRITE dcl.ns.clsrc VALUES (9, 'z')")
    spark.sql("INSERT INTO dcl.ns.clsrc VALUES (10, 'y')")

    // re-point ONE clone (deep copy), then reclaim the source
    val repointed = GraftMaintenance.deepenClone(Seq("ns"), "cl_deep")
    assert(repointed >= 1, "the clone should have held foreign segments")
    GraftMaintenance.vacuum(Seq("ns"), "clsrc")

    // the re-pointed clone keeps serving the original snapshot...
    assert(spark.table("graft_cat.ns.cl_deep").orderBy("id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // ...and again after ITS caches drop (forces a segment re-read)
    val deepTable = GraftTableStore.tables((Seq("ns"), "cl_deep"))
    deepTable.dataFiles.foreach(_.evict())
    assert(spark.table("graft_cat.ns.cl_deep").count() === 3)

    // the un-re-pointed clone dies LOUDLY, not silently empty (a real
    // row read — count() alone is answered from file stats)
    val shallow = GraftTableStore.tables((Seq("ns"), "cl_shallow"))
    shallow.dataFiles.foreach(_.evict())
    val e = intercept[Exception](
      spark.table("graft_cat.ns.cl_shallow").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("VACUUM") || m.contains("gone")),
      s"a vacuumed-away clone source must fail loudly: ${msgs(e)}")
  }
}
