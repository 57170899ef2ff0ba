package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AUTO-COMPACTION (`'auto.compact'='<minFiles>'` or `'<n>MB'`, Delta's
  * autoCompact / Iceberg's commit-triggered rewrite): after a
  * file-adding commit, any partition group crossing the trigger
  * compacts via a bounded OPTIMIZE on the BACKGROUND daemon — outside
  * the triggering commit's lease, with optimistic conflict-abort
  * against intervening commits. At 100 TB streaming ingest the
  * small-files problem is continuous — this keeps the file count flat
  * without a manual maintenance cadence and without maintenance cost
  * inside any ingest commit. */
class GraftAutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  private def graftTable(cat: String, ns: String, t: String): GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog].store.tables((Seq(ns), t))

  /** Drain the auto-compaction daemon before asserting a census. */
  private def quiesce(): Unit =
    assert(GraftAutoCompact.quiesce(), "auto-compact queue must drain")

  test("with the policy on, N small appends keep the file count under " +
      "the threshold; time travel still serves pre-compaction layouts") {
    val wh = tmpDir("graft-autoc")
    durableCatalog("aco", wh)
    spark.sql("CREATE TABLE aco.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('auto.compact'='4')")
    val t = graftTable("aco", "ns", "t")
    for (i <- 1 to 12) {
      spark.sql(s"INSERT INTO aco.ns.t VALUES ($i, 'r$i')")
      quiesce()
      assert(t.filesSnapshot.length < 4,
        s"after insert $i the census must stay under the threshold: " +
          s"${t.filesSnapshot.length} files")
    }
    // every row survives the interleaved compactions
    assert(spark.table("aco.ns.t").select("id").as[Long]
      .collect().toSeq.sorted === (1L to 12L))
    // the hook committed real OPTIMIZE entries...
    val ops = spark.sql("SELECT operation FROM aco.ns.`t$history`")
      .as[String].collect().toSeq
    assert(ops.count(_ == "OPTIMIZE") >= 3, s"history: $ops")
    // ...and time travel below a compaction serves the old layout/data
    val v3 = spark.table("aco.ns.t").sparkSession
      .sql("SELECT id FROM aco.ns.t VERSION AS OF 3").as[Long]
      .collect().toSeq.sorted
    assert(v3 === (1L to 3L), s"pre-compaction version: $v3")
    // the knob reports back
    assert(t.properties().get(GraftTable.AutoCompactProp) === "4")
  }

  test("with the policy off nothing changes: N appends = N files, " +
      "zero OPTIMIZE commits") {
    val wh = tmpDir("graft-autoc-off")
    durableCatalog("acf", wh)
    spark.sql("CREATE TABLE acf.ns.t (id BIGINT, v STRING)")
    for (i <- 1 to 8)
      spark.sql(s"INSERT INTO acf.ns.t VALUES ($i, 'r$i')")
    quiesce()
    assert(graftTable("acf", "ns", "t").filesSnapshot.length === 8)
    val ops = spark.sql("SELECT operation FROM acf.ns.`t$history`")
      .as[String].collect().toSeq
    assert(!ops.contains("OPTIMIZE"), s"history: $ops")
  }

  test("partitioned: only the offending group compacts — other groups' " +
      "files survive by reference") {
    val wh = tmpDir("graft-autoc-part")
    durableCatalog("acp", wh)
    spark.sql("CREATE TABLE acp.ns.t (id BIGINT, part INT, v STRING) " +
      "PARTITIONED BY (part) TBLPROPERTIES ('auto.compact'='4')")
    spark.sql("INSERT INTO acp.ns.t VALUES (0, 2, 'keep')")
    val t = graftTable("acp", "ns", "t")
    val keeper = t.filesSnapshot
      .find(_.groupKey.exists(_ == Seq(2))).get
    for (i <- 1 to 6)
      spark.sql(s"INSERT INTO acp.ns.t VALUES ($i, 1, 'r$i')")
    quiesce()
    // partition 1 compacted; partition 2's file is the SAME OBJECT
    val after = t.filesSnapshot
    assert(after.exists(_ eq keeper),
      "an untouched partition's file must carry over by reference")
    assert(after.count(_.groupKey.exists(_ == Seq(1))) < 4,
      s"partition 1 must have compacted: ${after.map(_.groupKey)}")
    assert(spark.table("acp.ns.t").count() === 7)
  }

  test("ALTER SET flips the policy on for a live table, UNSET stops it, " +
      "malformed thresholds refuse, and a restart folds the knob back") {
    val wh = tmpDir("graft-autoc-alter")
    durableCatalog("aca", wh)
    spark.sql("CREATE TABLE aca.ns.t (id BIGINT, v STRING)")
    for (i <- 1 to 5)
      spark.sql(s"INSERT INTO aca.ns.t VALUES ($i, 'r$i')")
    val t = graftTable("aca", "ns", "t")
    assert(t.filesSnapshot.length === 5)
    spark.sql("ALTER TABLE aca.ns.t SET TBLPROPERTIES ('auto.compact'='4')")
    spark.sql("INSERT INTO aca.ns.t VALUES (6, 'r6')") // 6 smalls -> compact
    quiesce()
    assert(t.filesSnapshot.length === 1,
      s"the first post-ALTER commit must compact: ${t.filesSnapshot.length}")
    // UNSET: appends accumulate again
    spark.sql("ALTER TABLE aca.ns.t UNSET TBLPROPERTIES ('auto.compact')")
    for (i <- 7 to 12)
      spark.sql(s"INSERT INTO aca.ns.t VALUES ($i, 'r$i')")
    quiesce()
    assert(t.filesSnapshot.length === 7)
    assert(t.properties().get(GraftTable.AutoCompactProp) === null)
    // refusals
    intercept[Exception](spark.sql(
      "ALTER TABLE aca.ns.t SET TBLPROPERTIES ('auto.compact'='1')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE aca.ns.t SET TBLPROPERTIES ('auto.compact'='soon')"))
    // the knob persists in the log: re-set, restart, and the folded
    // table both reports and ENFORCES it
    spark.sql("ALTER TABLE aca.ns.t SET TBLPROPERTIES ('auto.compact'='4')")
    durableCatalog("aca2", wh, isolated = true)
    val t2 = graftTable("aca2", "ns", "t")
    assert(t2.properties().get(GraftTable.AutoCompactProp) === "4")
    spark.sql("INSERT INTO aca2.ns.t VALUES (13, 'r13')")
    quiesce()
    assert(t2.filesSnapshot.length === 1,
      "the folded knob must enforce on the restarted table's commits")
    assert(spark.table("aca2.ns.t").count() === 13)
  }

  test("auto-compaction composes with partition-spec evolution into " +
      "regroup-on-write: the legacy remainder converges without a " +
      "manual OPTIMIZE") {
    val wh = tmpDir("graft-autoc-evo")
    durableCatalog("ace", wh)
    spark.sql("CREATE TABLE ace.ns.t (k INT, v BIGINT)")
    for (i <- 1 to 4) // 4 keyless files (policy still off)
      spark.sql(s"INSERT INTO ace.ns.t VALUES (${i % 2}, $i)")
    GraftMaintenance.sql(spark,
      "ALTER TABLE ace.ns.t SET PARTITIONED BY (k)").collect()
    spark.sql("ALTER TABLE ace.ns.t SET TBLPROPERTIES ('auto.compact'='4')")
    val t = graftTable("ace", "ns", "t")
    assert(t.filesSnapshot.forall(_.groupKey.isEmpty),
      "pre-evolution files degroup to the legacy remainder")
    // the next ORDINARY write's hook sees the keyless group at the
    // threshold and compacts it — and the compaction's per-key split
    // REGROUPS the remainder under the live spec (Iceberg's
    // rewrite-to-migrate, reached from the write path alone)
    spark.sql("INSERT INTO ace.ns.t VALUES (0, 100), (1, 101)")
    quiesce()
    assert(t.filesSnapshot.forall(_.groupKey.isDefined),
      s"the remainder must regroup on write: " +
        s"${t.filesSnapshot.map(_.groupKey)}")
    assert(spark.table("ace.ns.t").count() === 6)
    assert(spark.table("ace.ns.t").filter(col("k") === 1)
      .as[(Int, Long)].collect().map(_._2).sorted === Seq(1L, 3L, 101L))
  }

  test("byte trigger ('<n>KB'): groups compact on accumulated " +
      "sub-target BYTES, not file count — the streaming-ingest knob") {
    val wh = tmpDir("graft-autoc-bytes")
    durableCatalog("acb", wh)
    // a huge byte threshold first: small files accumulate freely
    spark.sql("CREATE TABLE acb.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('auto.compact'='1GB')")
    val t = graftTable("acb", "ns", "t")
    val pad = "x" * 1000
    for (i <- 1 to 6)
      spark.sql(s"INSERT INTO acb.ns.t VALUES ($i, '$pad')")
    quiesce()
    assert(t.filesSnapshot.length === 6,
      "under the byte threshold nothing compacts, whatever the count")
    // drop the threshold below the accumulated bytes: the next commit
    // triggers on SIZE
    spark.sql("ALTER TABLE acb.ns.t SET TBLPROPERTIES " +
      "('auto.compact'='4KB')")
    assert(t.properties().get(GraftTable.AutoCompactProp) === "4096B",
      "byte mode round-trips through properties()")
    spark.sql(s"INSERT INTO acb.ns.t VALUES (7, '$pad')")
    quiesce()
    assert(t.filesSnapshot.length < 7,
      s"accumulated bytes past the trigger must compact: " +
        s"${t.filesSnapshot.length}")
    assert(spark.table("acb.ns.t").count() === 7)
  }

  test("a PENDING compaction blocks nothing: the triggering commit " +
      "returns, later commits land, and the rewrite folds them in " +
      "when it finally runs") {
    val wh = tmpDir("graft-autoc-async")
    durableCatalog("acy", wh)
    spark.sql("CREATE TABLE acy.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('auto.compact'='3')")
    val t = graftTable("acy", "ns", "t")
    val gate = new java.util.concurrent.CountDownLatch(1)
    GraftAutoCompact.holdBeforePass = Some(gate)
    try {
      for (i <- 1 to 3) // the third commit enqueues; the daemon is held
        spark.sql(s"INSERT INTO acy.ns.t VALUES ($i, 'r$i')")
      // the triggering INSERT already returned (we are here), and with
      // the pass still PENDING further commits land freely — the
      // property a synchronous under-the-lease hook cannot have
      spark.sql("INSERT INTO acy.ns.t VALUES (4, 'r4')")
      spark.sql("INSERT INTO acy.ns.t VALUES (5, 'r5')")
      assert(t.filesSnapshot.length === 5,
        "commits while a compaction is pending must not block or fold")
    } finally {
      GraftAutoCompact.holdBeforePass = None
      gate.countDown()
    }
    quiesce()
    // the released pass re-censuses the CURRENT state: all five smalls
    // fold in one rewrite
    assert(t.filesSnapshot.length <= 2,
      s"the released pass must compact: ${t.filesSnapshot.length}")
    assert(spark.table("acy.ns.t").select("id").as[Long]
      .collect().toSeq.sorted === (1L to 5L))
  }

  test("conflict-abort: an intervening OVERWRITE between the rewrite " +
      "and the splice aborts the COMPACTION, never the ingest") {
    val wh = tmpDir("graft-autoc-conflict")
    durableCatalog("acc", wh)
    spark.sql("CREATE TABLE acc.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('auto.compact'='3')")
    val t = graftTable("acc", "ns", "t")
    val reached = new java.util.concurrent.CountDownLatch(1)
    val hold = new java.util.concurrent.CountDownLatch(1)
    GraftAutoCompact.reachedSplice = Some(reached)
    GraftAutoCompact.holdBeforeSplice = Some(hold)
    val abortsBefore = GraftAutoCompact.aborts.get()
    try {
      for (i <- 1 to 3)
        spark.sql(s"INSERT INTO acc.ns.t VALUES ($i, 'r$i')")
      // the pass has rebuilt its bins and is parked before the splice
      assert(reached.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "the pass must reach its splice point")
      // intervening commit rewrites the table — every planned input
      // file vanishes
      spark.sql("INSERT OVERWRITE acc.ns.t VALUES (100, 'winner')")
    } finally {
      GraftAutoCompact.reachedSplice = None
      GraftAutoCompact.holdBeforeSplice = None
      hold.countDown()
    }
    quiesce()
    assert(GraftAutoCompact.aborts.get() > abortsBefore,
      "the compaction must detect the conflict and abort")
    // the ingest won: exactly the overwrite's state, no resurrected
    // pre-overwrite rows, no OPTIMIZE commit on top
    assert(spark.table("acc.ns.t").select("id").as[Long]
      .collect().toSeq === Seq(100L))
    val ops = spark.sql("SELECT operation FROM acc.ns.`t$history` " +
      "ORDER BY version").as[String].collect().toSeq
    assert(ops.last === "OVERWRITE",
      s"no commit may land after the winning ingest: $ops")
  }

  test("a MOR table's per-statement delta files trigger the hook too") {
    val wh = tmpDir("graft-autoc-mor")
    durableCatalog("acm", wh)
    spark.sql("CREATE TABLE acm.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read', " +
      "'auto.compact'='4')")
    spark.sql("INSERT INTO acm.ns.t SELECT id, concat('r', id) " +
      "FROM range(0, 100)")
    val t = graftTable("acm", "ns", "t")
    // an async compaction landing between a row-level statement's scan
    // and its commit aborts the STATEMENT with the standard retry
    // contract (row addresses re-bind on retry) — the Delta/Iceberg
    // maintenance-vs-writer conflict shape, so the client loop here is
    // the documented client behavior, not a workaround
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    def update(i: Int, attempt: Int = 0): Unit =
      try spark.sql(s"UPDATE acm.ns.t SET v = 'u$i' WHERE id = $i")
      catch {
        case e: Exception if attempt < 3 && chain(e).exists(
            _.isInstanceOf[java.util.ConcurrentModificationException]) =>
          update(i, attempt + 1)
      }
    for (i <- 0 until 8) update(i)
    quiesce()
    assert(t.filesSnapshot.length < 8,
      s"MOR delta files must compact: ${t.filesSnapshot.length}")
    assert(spark.table("acm.ns.t").filter(col("v").startsWith("u"))
      .count() === 8)
    assert(spark.table("acm.ns.t").count() === 100)
  }
}
