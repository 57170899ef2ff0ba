package graft.sources

import graft.SparkSpec

/** Maintenance DDL as SQL: OPTIMIZE [ZORDER BY] / VACUUM / RESTORE
  * through the delegating parser ([[GraftSqlParser]], installed by the
  * `spark.sql.extensions` route) and its extension-less gateway
  * [[GraftMaintenance.sql]]. Everything that is not one of the three
  * verbs must reach Spark's own parser untouched. */
class GraftSqlCommandsSpec extends SparkSpec {
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

  test("OPTIMIZE compacts via SQL and reports the file census") {
    val t = freshTable("t_sqlopt")
    for (i <- 0 until 4) {
      val df = Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      if (i == 0) df.writeTo(t).create() else df.writeTo(t).append()
    }
    assert(store("t_sqlopt").dataFiles.length === 4)
    val res = GraftMaintenance.sql(spark, s"OPTIMIZE $t")
      .as[(Int, Int)].head()
    assert(res === ((4, 1)))
    assert(store("t_sqlopt").dataFiles.length === 1)
    assert(spark.table(t).count() === 4)
  }

  test("OPTIMIZE ZORDER BY via SQL re-lays the files along the curve") {
    val t = freshTable("t_sqlz")
    spark.range(0, 1024)
      .selectExpr("id % 32 AS x", "id DIV 32 AS y", "id AS payload")
      .writeTo(t).create()
    val res = GraftMaintenance.sql(spark,
      s"OPTIMIZE $t ZORDER BY (x, y) TARGET 64 ROWS")
      .as[(Int, Int)].head()
    assert(res._2 === 16, s"1024 rows at 64/file: $res")
    assert(spark.table(t).count() === 1024)
    // the layout actually helps: a 2-D box scan skips most files
    spark.table(t).filter($"x" < 8 && $"y" < 8).count()
    val census = store("t_sqlz").lastScanCensus.get
    assert(census.filesRead < census.filesTotal / 2,
      s"z-order layout must prune the box scan: $census")
  }

  test("VACUUM and RESTORE via SQL") {
    val t = freshTable("t_sqlvac")
    Seq((1L, "a")).toDF("id", "v").writeTo(t).create()      // v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")            // v2
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")            // v3

    val restored = GraftMaintenance.sql(spark,
      s"RESTORE TABLE $t TO VERSION AS OF 2").as[Int].head()
    assert(restored === 2)
    assert(spark.table(t).count() === 2)
    assert(store("t_sqlvac").commitHistory.map(_._1) === Seq(0, 1, 2, 3, 4))

    val retired = GraftMaintenance.sql(spark,
      s"VACUUM $t RETAIN 2 SNAPSHOTS").as[Int].head()
    assert(retired === 3)
    assert(store("t_sqlvac").commitHistory.map(_._1) === Seq(3, 4))
  }

  test("ZORDER BY accepts string columns: 7-byte-prefix curve agrees " +
      "with the zone maps' binary string order") {
    val t = freshTable("t_sqlz_str")
    // 26×16 grid over (letter-prefixed key, numeric bucket)
    spark.range(0, 416)
      .selectExpr(
        "concat(char(97 + id % 26), 'suffix') AS word",
        "CAST(id DIV 26 AS BIGINT) AS grp",
        "id AS payload")
      .writeTo(t).create()
    GraftMaintenance.sql(spark,
      s"OPTIMIZE $t ZORDER BY (word, grp) TARGET 26 ROWS")
    assert(spark.table(t).count() === 416)
    // a narrow word-range scan touches a minority of the 16 files
    val n = spark.table(t)
      .filter($"word" >= "a" && $"word" <= "c~").count()
    assert(n === 48)
    val census = store("t_sqlz_str").lastScanCensus.get
    assert(census.filesRead < census.filesTotal / 2,
      s"string z-order must prune the range scan: $census")
  }

  test("t$detail serves the DESCRIBE DETAIL facts") {
    val t = freshTable("t_detail")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read', " +
      "'constraints.idpos'='id > 0')")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id = 2") // MOR: one DV'd file
    val d = spark.table(s"graft_cat.ns.`t_detail$$detail`")
      .select("row_level_mode", "num_files", "num_rows", "num_dv_files",
        "num_dv_deleted_rows", "constraints", "retained_versions")
      .as[(String, Int, Long, Int, Long, String, String)].head()
    assert(d === (("merge-on-read", 1, 2L, 1, 1L, "idpos: id > 0", "0..2")))
  }

  test("VACUUM RETAIN n HOURS: time-based retention retires snapshots " +
      "older than the cutoff, never the current one") {
    val savedClock = GraftClock.nowMicros
    try {
      val hourUs = 3600L * 1000000L
      val t0 = 1000000000000000L
      var now = t0
      GraftClock.nowMicros = () => now
      val t = freshTable("t_sqlvh")
      spark.sql(s"CREATE TABLE $t (id BIGINT)")          // v0 @ t0
      now = t0 + 1 * hourUs
      spark.sql(s"INSERT INTO $t VALUES (1)")            // v1 @ t0+1h
      now = t0 + 4 * hourUs
      spark.sql(s"INSERT INTO $t VALUES (2)")            // v2 @ t0+4h
      now = t0 + 5 * hourUs
      // cutoff = now - 2h = t0+3h: v0 and v1 are older and retire,
      // v2 stays — Delta's RETAIN n HOURS contract
      val retired = GraftMaintenance.sql(spark,
        s"VACUUM $t RETAIN 2 HOURS").as[Int].head()
      assert(retired === 2, s"expected v0+v1 retired, got $retired")
      assert(spark.table(t).as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L), "current state must be untouched")
      val e = intercept[Exception](
        spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect())
      assert(e.getMessage != null)
      // everything inside the window: nothing retires, current kept
      assert(GraftMaintenance.sql(spark,
        s"VACUUM $t RETAIN 9999 HOURS").as[Int].head() === 0)
    } finally GraftClock.nowMicros = savedClock
  }

  test("a catalog-qualified maintenance statement scopes to THAT " +
      "catalog's warehouse when two warehouses share a table name") {
    def cat(name: String, wh: String): Unit = {
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    }
    cat("scope_a", tmpDir("graft-scope-a"))
    cat("scope_b", tmpDir("graft-scope-b"))
    spark.sql("CREATE TABLE scope_a.ns.t_same (id BIGINT)")
    spark.sql("CREATE TABLE scope_b.ns.t_same (id BIGINT)")
    spark.sql("INSERT INTO scope_a.ns.t_same VALUES (1)")
    spark.sql("INSERT INTO scope_a.ns.t_same VALUES (2)")
    spark.sql("INSERT INTO scope_b.ns.t_same VALUES (10)")
    // OPTIMIZE through catalog A must not commit a version on B's table
    def versions(c: String): Long =
      spark.sql(s"SELECT count(*) FROM $c.ns.`t_same$$history`")
        .as[Long].head()
    val (va0, vb0) = (versions("scope_a"), versions("scope_b"))
    GraftMaintenance.sql(spark, "OPTIMIZE scope_a.ns.t_same").collect()
    assert(versions("scope_a") === va0 + 1,
      "the qualified statement must act on catalog A's table")
    assert(versions("scope_b") === vb0,
      "catalog B's same-named table must be untouched — a cross-store " +
        "match would be silent cross-warehouse damage")
    // RESTORE through B rolls back ONLY B
    GraftMaintenance.sql(spark,
      "RESTORE TABLE scope_b.ns.t_same TO VERSION AS OF 0").collect()
    assert(spark.sql("SELECT count(*) FROM scope_b.ns.t_same")
      .as[Long].head() === 0L)
    assert(spark.sql("SELECT id FROM scope_a.ns.t_same ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L),
      "A's rows must survive B's restore")
  }

  test("the parser intercepts exactly the three verbs and delegates the " +
      "rest") {
    val p = new GraftSqlParser(spark.sessionState.sqlParser)
    assert(p.parsePlan("OPTIMIZE graft_cat.ns.x")
      .isInstanceOf[GraftMaintenanceCommand])
    assert(p.parsePlan("optimize graft_cat.ns.x zorder by (a, b)")
      .isInstanceOf[GraftMaintenanceCommand])
    assert(p.parsePlan("VACUUM graft_cat.ns.x RETAIN 3 SNAPSHOTS")
      .isInstanceOf[GraftMaintenanceCommand])
    assert(p.parsePlan("RESTORE TABLE graft_cat.ns.x TO VERSION AS OF 7")
      .isInstanceOf[GraftMaintenanceCommand])
    // everything else delegates to Spark's parser
    assert(!p.parsePlan("SELECT 1").isInstanceOf[GraftMaintenanceCommand])
    assert(!p.parsePlan("SELECT 'OPTIMIZE graft_cat.ns.x'")
      .isInstanceOf[GraftMaintenanceCommand])
    // unqualified names fail loudly at parse
    intercept[Exception](p.parsePlan("OPTIMIZE bare_name"))
    // the gateway passes ordinary SQL through to spark.sql
    assert(GraftMaintenance.sql(spark, "SELECT 41 + 1")
      .as[Int].head() === 42)
  }
}
