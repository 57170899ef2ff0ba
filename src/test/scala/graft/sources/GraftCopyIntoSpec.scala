package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** `COPY INTO t FROM '<dir>'` — Delta's idempotent bulk-file ingest:
  * per-file load marks ride the table's persisted exactly-once ledger
  * and publish ATOMICALLY with the append's commit, so re-runs, crashed
  * retries and concurrent copiers converge on exactly-once per file.
  * One commit per execution whatever the file count. */
class GraftCopyIntoSpec extends SparkSpec {
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

  private def copy(cat: String, t: String, dir: String,
                   extra: String = ""): (Int, Int, Long) = {
    val r = GraftMaintenance.sql(spark,
      s"COPY INTO $cat.ns.$t FROM '$dir'$extra").head()
    (r.getInt(0), r.getInt(1), r.getLong(2))
  }

  test("files load once: re-runs skip, new files load incrementally, " +
      "the marks fold across a restart, one commit per execution") {
    val wh = tmpDir("graft-copy")
    val src = tmpDir("graft-copy-src")
    durableCatalog("cpi", wh)
    spark.sql("CREATE TABLE cpi.ns.t (id BIGINT, v STRING)")
    (1L to 40L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(3).write.mode("overwrite").parquet(s"$src/batch1")

    val (l1, s1, r1) = copy("cpi", "t", src)
    assert(l1 === 3 && s1 === 0 && r1 === 40L, s"($l1, $s1, $r1)")
    val t = graftTable("cpi", "ns", "t")
    val vAfterFirst = t.currentVersion
    assert(spark.table("cpi.ns.t").count() === 40L)

    // idempotent re-run: zero loads, zero commits
    val (l2, s2, r2) = copy("cpi", "t", src)
    assert(l2 === 0 && s2 === 3 && r2 === 0L, s"($l2, $s2, $r2)")
    assert(t.currentVersion === vAfterFirst, "a full skip must not commit")
    assert(spark.table("cpi.ns.t").count() === 40L)

    // new arrivals load incrementally — ONE commit for both files
    (41L to 60L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(2).write.mode("overwrite").parquet(s"$src/batch2")
    val (l3, s3, r3) = copy("cpi", "t", src)
    assert(l3 === 2 && s3 === 3 && r3 === 20L, s"($l3, $s3, $r3)")
    assert(t.currentVersion === vAfterFirst + 1,
      "a multi-file COPY lands as one commit")
    assert(spark.table("cpi.ns.t").select("id").as[Long]
      .collect().toSeq.sorted === (1L to 60L))

    // the marks ride the log: a cold fold in a fresh store still skips
    durableCatalog("cpi2", wh, isolated = true)
    val rr = GraftMaintenance.sql(spark,
      s"COPY INTO cpi2.ns.t FROM '$src'").head()
    assert(rr.getInt(0) === 0 && rr.getInt(1) === 5,
      s"restart must fold the per-file marks: $rr")
    assert(spark.table("cpi2.ns.t").count() === 60L)
  }

  test("PATTERN scopes the load; FILEFORMAT refuses non-parquet") {
    val wh = tmpDir("graft-copy-pat")
    val src = tmpDir("graft-copy-pat-src")
    durableCatalog("cpp", wh)
    spark.sql("CREATE TABLE cpp.ns.t (id BIGINT, v STRING)")
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/in")
    Seq((2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/out")
    val (l1, _, _) = copy("cpp", "t", src, " PATTERN = 'in/*.parquet'")
    assert(l1 === 1)
    assert(spark.table("cpp.ns.t").select("id").as[Long]
      .collect().toSeq === Seq(1L))
    // widening the pattern later loads only what the first pass missed
    val (l2, s2, _) = copy("cpp", "t", src)
    assert(l2 === 1 && s2 === 1)
    assert(spark.table("cpp.ns.t").count() === 2L)
    val e = intercept[Exception](copy("cpp", "t", src,
      " FILEFORMAT = CSV"))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("PARQUET only")), e.getMessage)
  }

  test("schema conformance is strict: lossless upcasts apply, drifted " +
      "sources refuse loudly and load nothing") {
    val wh = tmpDir("graft-copy-schema")
    val src = tmpDir("graft-copy-schema-src")
    durableCatalog("cps", wh)
    spark.sql("CREATE TABLE cps.ns.t (id BIGINT, v STRING)")
    // INT source column upcasts to the BIGINT target losslessly
    Seq((1, "a")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/ok")
    val (l1, _, _) = copy("cps", "t", src)
    assert(l1 === 1)
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    // extra column: refuse
    Seq((2L, "b", 1.5)).toDF("id", "v", "extra").coalesce(1)
      .write.parquet(s"$src/extra")
    val e1 = intercept[Exception](copy("cps", "t", src))
    assert(msgs(e1).exists(_.contains("columns the table lacks")))
    // missing column: refuse
    val src2 = tmpDir("graft-copy-schema-src2")
    Seq(Tuple1(3L)).toDF("id").coalesce(1).write.parquet(s"$src2/miss")
    val e2 = intercept[Exception](copy("cps", "t", src2))
    assert(msgs(e2).exists(_.contains("missing column")))
    // lossy type drift: refuse (no silent NULL-casting)
    val src3 = tmpDir("graft-copy-schema-src3")
    Seq((1.5, "x")).toDF("id", "v").coalesce(1).write.parquet(s"$src3/lossy")
    val e3 = intercept[Exception](copy("cps", "t", src3))
    assert(msgs(e3).exists(_.contains("lossless")), e3.getMessage)
    assert(spark.table("cps.ns.t").count() === 1L,
      "refused copies must load nothing")
  }
}
