package graft.sources

import graft.SparkSpec

/** Round-10 (VERDICT task 4): the commit protocol under REAL process
  * isolation — forked JVMs, separate file-lock domains, nothing shared
  * but the warehouse directory. GraftCommitProtocolSpec interleaves two
  * stores in one JVM; these tests fork actual `java` children running
  * [[ForkedWriterMain]] against the same warehouse. */
class GraftMultiProcessSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean = false,
                             logstore: String = "local-fs"): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (logstore != "local-fs")
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.logstore", logstore)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  /** Same module flags build.sbt gives the test JVM — Spark 4 on JDK 17
    * needs them in the child too. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(mode: String, wh: String, cat: String, tbl: String,
                   from: Long, to: Long,
                   logstore: String = "local-fs"): (Process, java.io.File) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val log = java.io.File.createTempFile(s"forked-$cat-", ".log")
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.sources.ForkedWriterMain",
      mode, wh, cat, tbl, from.toString, to.toString, logstore)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(log))
    (pb.start(), log)
  }

  private def awaitExit(p: Process, log: java.io.File,
                        expected: Int): Unit = {
    assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), {
      p.destroyForcibly()
      s"child did not finish; log tail:\n${tailOf(log)}"
    })
    assert(p.exitValue() === expected,
      s"child exit ${p.exitValue()} != $expected; log tail:\n${tailOf(log)}")
  }

  private def tailOf(f: java.io.File): String = {
    val lines = scala.io.Source.fromFile(f)
    try lines.getLines().toSeq.takeRight(30).mkString("\n")
    finally lines.close()
  }

  test("two forked JVMs appending concurrently: every row lands, the " +
      "log is contiguous, a fresh process sees all of it") {
    val wh = tmpDir("graft-mp-append")
    durableCatalog("mpp", wh)
    spark.sql("CREATE TABLE mpp.ns.mpa (id BIGINT, v STRING)")

    val (p1, l1) = fork("append", wh, "w1", "mpa", 1L, 25L)
    val (p2, l2) = fork("append", wh, "w2", "mpa", 26L, 50L)
    awaitExit(p1, l1, 0)
    awaitExit(p2, l2, 0)

    // a THIRD process (fresh isolated catalog in this JVM) replays the
    // log the two children wrote
    durableCatalog("mpr", wh, isolated = true)
    val ids = spark.sql("SELECT id FROM mpr.ns.mpa ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids === (1L to 50L),
      "all 50 cross-process appends must land exactly once")

    // log versions are CONTIGUOUS — the CAS never skipped or duplicated
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()
    import scala.jdk.CollectionConverters._
    val versions = java.nio.file.Files.list(tableDir.resolve("log"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toInt)
      .toSeq.sorted
    assert(versions === (versions.min to versions.max),
      s"commit versions must be gapless: $versions")
    assert(versions.max >= 50, "50 inserts = at least 50 commits")
  }

  test("two forked JVMs COPY INTO the same landing dir concurrently: " +
      "every file loads exactly once across processes") {
    val wh = tmpDir("graft-mp-copy")
    durableCatalog("mpcy", wh)
    // auto-compaction ON: each process's background daemon races the
    // other's COPY commits — splice conflicts must abort the
    // compaction harmlessly, never corrupt the exactly-once contract
    // (the content assertion below is the proof)
    spark.sql("CREATE TABLE mpcy.ns.mpcp (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('auto.compact'='4')")
    val land = wh + "-landing" // the children derive the same path
    (1L to 200L).map(i => (i, s"f$i")).toDF("id", "v")
      .repartition(8).write.parquet(s"$land/b1")

    // each child runs the statement 3 times; the racing pair's commit
    // loser must recognize the winner's per-file marks (skip or the
    // retry contract), never double-load
    val (p1, l1) = fork("copyinto", wh, "c1", "mpcp", 1L, 3L)
    val (p2, l2) = fork("copyinto", wh, "c2", "mpcp", 1L, 3L)
    awaitExit(p1, l1, 0)
    awaitExit(p2, l2, 0)

    durableCatalog("mpcr", wh, isolated = true)
    val ids = spark.sql("SELECT id FROM mpcr.ns.mpcp ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids === (1L to 200L),
      "cross-process COPY INTO must land every file exactly once")
    // and THIS process's own re-run folds the children's marks: no-op
    val r = GraftMaintenance.sql(spark,
      s"COPY INTO mpcr.ns.mpcp FROM '$land'").head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 8, s"$r")
  }

  test("two forked JVMs fork/write/fast-forward/drop branches on one " +
      "table concurrently: contended forwards re-fork (the optimistic " +
      "contract), every audited row lands exactly once, no branch " +
      "chain survives") {
    val wh = tmpDir("graft-mp-branch")
    durableCatalog("mpbw", wh)
    spark.sql("CREATE TABLE mpbw.ns.mpbt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mpbw.ns.mpbt VALUES (0, 'seed')")

    val (p1, l1) = fork("branch", wh, "bw1", "mpbt", 1L, 8L)
    val (p2, l2) = fork("branch", wh, "bw2", "mpbt", 101L, 108L)
    awaitExit(p1, l1, 0)
    awaitExit(p2, l2, 0)

    // a fresh fold converges on exactly-once adoption of every
    // fast-forwarded audit row, from both children
    durableCatalog("mpbr", wh, isolated = true)
    val ids = spark.sql("SELECT id FROM mpbr.ns.mpbt ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids === (0L +: ((1L to 8L) ++ (101L to 108L))).sorted,
      s"each branch's audited row must land exactly once: $ids")
    // every branch was dropped: the log dir holds no chain subdirs and
    // the retained main log is gapless
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()
    import scala.jdk.CollectionConverters._
    val logKids = java.nio.file.Files.list(tableDir.resolve("log"))
      .iterator().asScala.toSeq
    assert(!logKids.exists(java.nio.file.Files.isDirectory(_)),
      s"no branch chain may survive the soak: $logKids")
    val versions = logKids.map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && n.length == 16)
      .map(_.stripSuffix(".json").toInt).sorted
    assert(versions === (versions.min to versions.max),
      s"commit versions must be gapless: $versions")
    // the format stamp survives: branches existed, pre-branch engines
    // must refuse this table even though none is live now
    val meta = GraftLogCodec.decodeTableMeta(new String(
      java.nio.file.Files.readAllBytes(tableDir.resolve("table.json")),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(meta.format === GraftLogCodec.BranchFormat)
    // the ref-lifecycle AUDIT (r19) saw both processes' DDL: every
    // branch that lived leaves CREATE/FAST_FORWARD/DROP rows, written
    // as CAS'd files by TWO real JVMs concurrently and served here by
    // a fresh fold — two distinct actors, no torn reads
    val ev = spark.table("mpbr.ns.`mpbt$refs_log`")
      .select("action", "actor")
      .as[(String, String)].collect().toSeq
    val byAction = ev.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byAction.getOrElse("CREATE_BRANCH", 0) >= 16 &&
      byAction.getOrElse("FAST_FORWARD", 0) >= 16 &&
      byAction.getOrElse("DROP_BRANCH", 0) >= 16,
      s"both children's ref DDL must be audited: $byAction")
    assert(ev.map(_._2).distinct.size >= 2,
      s"two processes must appear as distinct actors: " +
        s"${ev.map(_._2).distinct}")
  }

  /** The 3-JVM mixed DML/OPTIMIZE soak, parameterized by the
    * [[GraftLogStore]] backend: `local-fs` (hard-link CAS + OS file
    * lock) and `file-cas` (atomic create-new only — the object-store-
    * shaped protocol) must both converge across REAL process
    * boundaries. `tag` keeps the two runs' catalog names disjoint. */
  private def mixedSoak(logstore: String, tag: String): Unit = {
    val wh = tmpDir(s"graft-mp-mixed-$tag")
    durableCatalog(s"mpm$tag", wh, logstore = logstore)
    spark.sql(s"CREATE TABLE mpm$tag.ns.mpmx (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read')")

    val ranges = Seq((1L, 24L), (25L, 48L), (49L, 72L))
    val procs = ranges.zipWithIndex.map { case ((a, b), i) =>
      fork("mixed", wh, s"mw$tag$i", "mpmx", a, b, logstore)
    }
    procs.foreach { case (p, l) => awaitExit(p, l, 0) }

    // deterministic convergence: each child inserts its range, MERGEs
    // v on every 5th id, DELETEs every 11th — survivors are the ids
    // not divisible by 11, with the merged label where applicable
    val expected = (1L to 72L).filter(_ % 11 != 0)
    durableCatalog(s"mpmr$tag", wh, isolated = true, logstore = logstore)
    val got = spark.sql(s"SELECT id, v FROM mpmr$tag.ns.mpmx ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got.map(_._1) === expected,
      "every surviving row lands exactly once across three processes")
    got.foreach { case (id, v) =>
      val owner = ranges.indexWhere { case (a, b) => id >= a && id <= b }
      val want = if (id % 5 == 0) s"m-mw$tag$owner" else s"w-mw$tag$owner"
      assert(v === want, s"row $id must carry its owner's final label")
    }

    // gapless log from the retained anchor
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(q => java.nio.file.Files.isRegularFile(q.resolve("table.json")))
      .findFirst().orElseThrow()
    import scala.jdk.CollectionConverters._
    def segSet: Set[String] = java.nio.file.Files
      .list(tableDir.resolve("data")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val versions = java.nio.file.Files.list(tableDir.resolve("log"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toInt)
      .toSeq.sorted
    assert(versions === (versions.min to versions.max),
      s"commit versions must be gapless: $versions")

    // orphan sweep: after one VACUUM, a SECOND process's sweep finds
    // nothing more to reclaim — zero unreferenced bytes remain — and
    // the data still reads green
    GraftMaintenance.sql(spark, s"VACUUM mpmr$tag.ns.mpmx").collect()
    val afterFirst = segSet
    durableCatalog(s"mpm2$tag", wh, isolated = true, logstore = logstore)
    GraftMaintenance.sql(spark, s"VACUUM mpm2$tag.ns.mpmx").collect()
    assert(segSet === afterFirst,
      "a fresh process's sweep must find zero unreferenced segments")
    assert(spark.sql(s"SELECT id FROM mpm2$tag.ns.mpmx ORDER BY id")
      .as[Long].collect().toSeq === expected)
  }

  test("three forked JVMs mixing appends, MOR MERGE/DELETE and " +
      "OPTIMIZE converge; the orphan sweep leaves zero reclaimable " +
      "bytes (r12)") {
    mixedSoak("local-fs", "lf")
  }

  test("the same 3-JVM mixed soak converges on the FILE-CAS backend: " +
      "atomic create-new only — no hard links, no OS locks — across " +
      "real process boundaries (r13)") {
    mixedSoak("file-cas", "fc")
  }

  test("three forked JVMs inserting into one IDENTITY table mint " +
      "unique ids: the optimistic block reservation conflicts and " +
      "retries across real process boundaries (r13)") {
    val wh = tmpDir("graft-mp-idn")
    durableCatalog("mpi", wh)
    spark.sql("CREATE TABLE mpi.ns.mpid (id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY, v STRING)")
    val procs = (0 until 3).map { i =>
      fork("identity", wh, s"mi$i", "mpid", 1L, 12L)
    }
    procs.foreach { case (p, l) => awaitExit(p, l, 0) }
    durableCatalog("mpir", wh, isolated = true)
    val rows = spark.sql("SELECT id, v FROM mpir.ns.mpid")
      .as[(Long, String)].collect().toSeq
    assert(rows.length === 36, s"every insert lands once: ${rows.length}")
    assert(rows.map(_._1).distinct.length === 36,
      s"ids must be UNIQUE across processes: " +
        s"${rows.groupBy(_._1).filter(_._2.length > 1)}")
    // each writer's 12 rows all present (no lost inserts under retry)
    (0 until 3).foreach { i =>
      assert(rows.count(_._2.startsWith(s"w-mi$i-")) === 12)
    }
    // the ledger's high-water survived every fold: a fresh insert
    // stays above everything minted so far
    spark.sql("INSERT INTO mpir.ns.mpid (v) VALUES ('post')")
    val all = spark.sql("SELECT id FROM mpir.ns.mpid")
      .as[Long].collect().toSeq
    assert(all.distinct.length === 37)
  }

  test("CREATE TAG in this JVM racing RETAIN-0 sweeps on a sibling " +
      "chain in a forked JVM: every tag either serves bit-exact or " +
      "the CREATE fails loudly — never a dangling tag (r18)") {
    val wh = tmpDir("graft-mp-tagrace")
    durableCatalog("mpt", wh)
    spark.sql("CREATE TABLE mpt.ns.mptt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mpt.ns.mptt VALUES (0, 'seed')")
    GraftMaintenance.sql(spark,
      "ALTER TABLE mpt.ns.mptt CREATE BRANCH sweep").collect()

    // the sibling: overwrite + RETAIN-1 vacuum (minAge-0 sweep) loops
    // on the branch chain, holding only the BRANCH lease
    val (p, l) = fork("tagsweep", wh, "ts1", "mptt", 1L, 40L)

    // this JVM: create → read → drop tags on MAIN while the sibling
    // sweeps. A loud raced-refusal is a legitimate outcome; a tag that
    // CREATEs but cannot read back bit-exact is the forbidden one.
    var created = 0
    var fenced = 0
    (1 to 60).foreach { i =>
      spark.sql(s"INSERT INTO mpt.ns.mptt VALUES ($i, 'm-$i')")
      val ok =
        try {
          GraftMaintenance.sql(spark,
            s"ALTER TABLE mpt.ns.mptt CREATE TAG snap").collect()
          true
        } catch {
          case e: Exception
              if e.getMessage != null &&
                (e.getMessage.contains("RETAIN-0") ||
                  e.getMessage.contains("reclaimed")) =>
            fenced += 1; false
        }
      if (ok) {
        created += 1
        val got = spark.sql(
          "SELECT id, v FROM mpt.ns.`mptt@snap` ORDER BY id")
          .as[(Long, String)].collect().toSeq
        assert(got === (0L, "seed") +: (1L to i.toLong)
          .map(j => (j, s"m-$j")),
          s"tag $i must serve bit-exact after surviving the race: $got")
        GraftMaintenance.sql(spark,
          "ALTER TABLE mpt.ns.mptt DROP TAG snap").collect()
      }
    }
    awaitExit(p, l, 0)
    assert(created > 0,
      s"the race must not starve tag creation entirely ($fenced fenced)")
    // post-race: no tag remnant, both chains healthy, a fresh fold agrees
    durableCatalog("mptr", wh, isolated = true)
    assert(spark.sql("SELECT count(*) FROM mptr.ns.mptt").as[Long]
      .head() === 61L)
    assert(spark.sql("SELECT v FROM mptr.ns.`mptt@sweep`").as[String]
      .collect().toSeq === Seq("s-40"))
    assert(spark.table("mptr.ns.`mptt$branches`")
      .select("name").as[String].collect().toSeq === Seq("sweep"),
      "no tag may survive the loop — every created tag was dropped, " +
        "every fenced tag self-deleted")
  }

  test("view DDL from a forked JVM is visible here WITHOUT re-open: " +
      "the replaced definition serves, the dropped view refuses — " +
      "disk is the source of truth, no invalidation protocol (r18)") {
    val wh = tmpDir("graft-mp-views")
    durableCatalog("mpvw", wh)
    spark.sql("CREATE TABLE mpvw.ns.mpvt (id BIGINT)")
    spark.sql("INSERT INTO mpvw.ns.mpvt VALUES (1), (2), (3), (4)")
    // SAME catalog name both sides: a stored view body references its
    // tables by catalog-qualified name, and catalog names are session
    // config — a deployment keeps them consistent across jobs (the
    // same contract Iceberg's V2 views have)
    val (p, l) = fork("views", wh, "mpvw", "mpvt", 0L, 0L)
    awaitExit(p, l, 0)
    // the child CREATEd then REPLACEd child_v (evens → odds): this
    // process must see the REPLACED definition, with zero re-open
    assert(spark.sql("SELECT id FROM mpvw.ns.child_v ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 3L),
      "the sibling's replaced view definition must serve here")
    // the child's dropped view refuses here too
    intercept[Exception](
      spark.sql("SELECT * FROM mpvw.ns.child_gone").collect())
    // and this process's SHOW VIEWS agrees with the child's final state
    val shown = GraftMaintenance.sql(spark, "SHOW VIEWS IN mpvw.ns")
      .as[(String, String)].collect().toSeq
    assert(shown === Seq(("ns", "child_v")), shown.toString)
    // a racing duplicate CREATE from this side refuses via the CAS
    intercept[Exception](GraftMaintenance.sql(spark,
      "CREATE VIEW mpvw.ns.child_v AS SELECT 1 AS x").collect())
  }

  test("a child killed after landing segments but before commit leaves " +
      "only unreferenced files; the warehouse stays healthy") {
    val wh = tmpDir("graft-mp-crash")
    durableCatalog("mpc", wh)
    spark.sql("CREATE TABLE mpc.ns.mpx (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mpc.ns.mpx VALUES (1, 'a'), (2, 'b')")

    val (p, l) = fork("crash", wh, "wc", "mpx", 0L, 0L)
    awaitExit(p, l, 137)

    // a brand-new process opens the warehouse without complaint and
    // serves exactly the committed rows — the orphan is invisible
    durableCatalog("mpv", wh, isolated = true)
    assert(spark.sql("SELECT id FROM mpv.ns.mpx ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))

    // the crash left the orphaned segment on disk...
    val tableDir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .filter(q => java.nio.file.Files.isRegularFile(q.resolve("table.json")))
      .findFirst().orElseThrow()
    import scala.jdk.CollectionConverters._
    def segCount: Long = java.nio.file.Files.list(tableDir.resolve("data"))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    val withOrphan = segCount

    // ...and VACUUM's sweep reclaims it without touching live data
    GraftMaintenance.sql(spark, "VACUUM mpv.ns.mpx").collect()
    assert(segCount < withOrphan,
      "the orphaned segment must be reclaimed by the sweep")
    assert(spark.sql("SELECT count(*) FROM mpv.ns.mpx").as[Long].head()
      === 2L)
  }
}
