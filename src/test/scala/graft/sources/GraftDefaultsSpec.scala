package graft.sources

import graft.SparkSpec

/** Column DEFAULT values (TableCatalogCapability
  * .SUPPORT_COLUMN_DEFAULT_VALUE): Spark's analyzer resolves CREATE-time
  * defaults into the schema metadata and substitutes them at INSERT for
  * omitted columns and the DEFAULT keyword — rows materialize with the
  * value, storage stays ordinary. */
class GraftDefaultsSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE-time defaults fill omitted columns and the DEFAULT " +
      "keyword at INSERT; they persist across restart") {
    val wh = tmpDir("graft-def")
    spark.conf.set("spark.sql.catalog.dft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dft.warehouse", wh)
    spark.sql("CREATE TABLE dft.ns.t (id BIGINT, " +
      "status STRING DEFAULT 'new', score INT DEFAULT 7)")
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (1)")
    spark.sql("INSERT INTO dft.ns.t VALUES (2, 'done', DEFAULT)")
    spark.sql("INSERT INTO dft.ns.t (id, status) VALUES (3, DEFAULT)")
    val got = spark.table("dft.ns.t").orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "new", 7), (2L, "done", 7), (3L, "new", 7)))

    // restart: defaults ride the schema metadata in the log
    spark.conf.set("spark.sql.catalog.dfr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.dfr.warehouse.isolated", "true")
    spark.sql("INSERT INTO dfr.ns.t (id) VALUES (4)")
    assert(spark.table("dfr.ns.t").orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
      === Seq((1L, "new", 7), (2L, "done", 7), (3L, "new", 7),
        (4L, "new", 7)))
  }

  test("ALTER ADD COLUMN ... DEFAULT (r19, EXISTS_DEFAULT): existing " +
      "rows read the default via the stateless footer backfill, stored " +
      "values — NULL included — stay themselves, restarts and COW " +
      "rewrites agree, and a non-literal default refuses") {
    val wh = tmpDir("graft-exdef")
    spark.conf.set("spark.sql.catalog.dfe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfe.warehouse", wh)
    spark.sql("CREATE TABLE dfe.ns.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dfe.ns.t VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE dfe.ns.t ADD COLUMN score INT DEFAULT 7")
    // pre-add files backfill at READ (metadata-only add — no rewrite)
    assert(spark.table("dfe.ns.t").orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
      === Seq((1L, "a", 7), (2L, "b", 7)))
    // CURRENT_DEFAULT at INSERT; an EXPLICIT NULL stays NULL (the new
    // file stores the column — the backfill never touches stored rows)
    spark.sql("INSERT INTO dfe.ns.t (id, v) VALUES (3, 'c')")
    spark.sql("INSERT INTO dfe.ns.t VALUES (4, 'd', NULL)")
    assert(spark.table("dfe.ns.t").orderBy("id")
      .as[(Long, String, Option[Int])].collect().toSeq
      === Seq((1L, "a", Some(7)), (2L, "b", Some(7)),
        (3L, "c", Some(7)), (4L, "d", None)))
    // filters see the backfilled value on pre-add files
    assert(spark.sql(
      "SELECT count(*) FROM dfe.ns.t WHERE score = 7").head().getLong(0)
      === 3L)
    // time travel to a pre-add version serves the OLD schema
    assert(spark.sql("SELECT * FROM dfe.ns.t VERSION AS OF 1")
      .columns.toSeq === Seq("id", "v"))
    // restart (isolated second store): the default rides the log
    spark.conf.set("spark.sql.catalog.dfe2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfe2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.dfe2.warehouse.isolated", "true")
    assert(spark.table("dfe2.ns.t").orderBy("id")
      .as[(Long, String, Option[Int])].collect().toSeq
      === Seq((1L, "a", Some(7)), (2L, "b", Some(7)),
        (3L, "c", Some(7)), (4L, "d", None)))
    spark.sql("INSERT INTO dfe2.ns.t (id, v) VALUES (5, 'e')")
    assert(spark.table("dfe.ns.t").count() === 5L)
    // a COW rewrite of a pre-add row MATERIALIZES the default: the
    // rewritten file stores 7 physically, and the row still reads 7
    spark.sql("UPDATE dfe.ns.t SET v = 'A' WHERE id = 1")
    assert(spark.table("dfe.ns.t").filter($"id" === 1L)
      .as[(Long, String, Option[Int])].head() === ((1L, "A", Some(7))))
    // chained evolution: a SECOND defaulted add backfills independently
    spark.sql("ALTER TABLE dfe.ns.t ADD COLUMN tag STRING DEFAULT 'z'")
    assert(spark.sql("SELECT count(*) FROM dfe.ns.t WHERE tag = 'z'")
      .head().getLong(0) === 5L)
    // non-literal defaults refuse loudly at ALTER time
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE dfe.ns.t ADD COLUMN bad INT DEFAULT id"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // Spark's analyzer refuses the unresolvable expression itself
    // (INVALID_DEFAULT_VALUE); the catalog's own literal guard backs
    // it up for anything that slips past
    assert(msgs(e).exists(m => m.contains("DEFAULT value") ||
      (m.contains("DEFAULT") && (m.contains("literal") ||
        m.contains("constant")))), e)
    // a plain nullable ADD COLUMN still null-pads (no default promised)
    spark.sql("ALTER TABLE dfe.ns.t ADD COLUMN plain STRING")
    assert(spark.sql(
      "SELECT count(*) FROM dfe.ns.t WHERE plain IS NULL")
      .head().getLong(0) === 5L)
    // the change feed agrees: a DELETE of a PRE-ADD row emits its
    // preimage with the backfilled default, not NULL
    spark.sql("DELETE FROM dfe.ns.t WHERE id = 2")
    val del = spark.table("dfe.ns.`t$changes`")
      .filter($"_change_type" === "delete" && $"id" === 2L)
      .select("score").as[Option[Int]].collect().toSeq
    assert(del === Seq(Some(7)),
      s"the CDC preimage must carry the backfilled default: $del")
  }

  test("EXISTS_DEFAULT across types: DATE, DECIMAL, BOOLEAN and DOUBLE " +
      "defaults backfill pre-add rows and fill omitted INSERT columns " +
      "(the session-free literal eval + ANSI cast path)") {
    val wh = tmpDir("graft-exdef-ty")
    spark.conf.set("spark.sql.catalog.dfty", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfty.warehouse", wh)
    spark.sql("CREATE TABLE dfty.ns.t (id BIGINT)")
    spark.sql("INSERT INTO dfty.ns.t VALUES (1)")
    spark.sql("ALTER TABLE dfty.ns.t ADD COLUMN d DATE " +
      "DEFAULT DATE'2024-01-15'")
    spark.sql("ALTER TABLE dfty.ns.t ADD COLUMN m DECIMAL(9,2) " +
      "DEFAULT 1.25")
    spark.sql("ALTER TABLE dfty.ns.t ADD COLUMN b BOOLEAN DEFAULT true")
    spark.sql("ALTER TABLE dfty.ns.t ADD COLUMN x DOUBLE DEFAULT 2.5")
    // pre-add row backfills every type
    val r1 = spark.table("dfty.ns.t").filter($"id" === 1L)
      .selectExpr("CAST(d AS STRING)", "CAST(m AS STRING)", "b", "x")
      .as[(String, String, Boolean, Double)].head()
    assert(r1 === (("2024-01-15", "1.25", true, 2.5)), r1.toString)
    // omitted columns at INSERT fill the same values (CURRENT_DEFAULT)
    spark.sql("INSERT INTO dfty.ns.t (id) VALUES (2)")
    val r2 = spark.table("dfty.ns.t").filter($"id" === 2L)
      .selectExpr("CAST(d AS STRING)", "CAST(m AS STRING)", "b", "x")
      .as[(String, String, Boolean, Double)].head()
    assert(r2 === r1, s"$r2 != $r1")
    // explicit values override; the backfill never touches stored rows
    spark.sql("INSERT INTO dfty.ns.t VALUES " +
      "(3, DATE'1999-12-31', 9.99, false, 0.5)")
    val r3 = spark.table("dfty.ns.t").filter($"id" === 3L)
      .selectExpr("CAST(d AS STRING)", "CAST(m AS STRING)", "b", "x")
      .as[(String, String, Boolean, Double)].head()
    assert(r3 === (("1999-12-31", "9.99", false, 0.5)), r3.toString)
    // filters over the backfilled columns behave
    assert(spark.sql("SELECT count(*) FROM dfty.ns.t " +
      "WHERE d = DATE'2024-01-15' AND m = 1.25 AND b AND x = 2.5")
      .head().getLong(0) === 2L)
  }
}
