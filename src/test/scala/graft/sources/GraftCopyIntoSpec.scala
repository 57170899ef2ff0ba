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

  test("PATTERN scopes the load; FILEFORMAT refuses unsupported formats") {
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
      " FILEFORMAT = ORC"))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("PARQUET, CSV or JSON")), e.getMessage)
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

  private def msgsOf(x: Throwable): Seq[String] =
    if (x == null) Nil
    else Option(x.getMessage).toSeq ++ msgsOf(x.getCause)

  test("FILEFORMAT = CSV: header names resolve the columns, values " +
      "parse into the table's types, malformed cells and drifted " +
      "headers refuse loudly, marks keep re-runs idempotent") {
    val wh = tmpDir("graft-copy-csv")
    val src = tmpDir("graft-copy-csv-src")
    durableCatalog("ccv", wh)
    spark.sql("CREATE TABLE ccv.ns.t (id BIGINT, v STRING, d DATE)")
    // header order differs from the table order — names resolve it
    Files.write(Paths.get(src, "a.csv"),
      "v,id,d\nalpha,1,2024-01-02\nbeta,2,2024-02-03\n".getBytes)
    val (l1, s1, r1) = copy("ccv", "t", src, " FILEFORMAT = CSV")
    assert((l1, s1, r1) === ((1, 0, 2L)))
    val got = spark.table("ccv.ns.t").orderBy("id")
      .selectExpr("id", "v", "CAST(d AS STRING)")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "alpha", "2024-01-02"),
      (2L, "beta", "2024-02-03")))
    // idempotent re-run
    val (l2, s2, _) = copy("ccv", "t", src, " FILEFORMAT = CSV")
    assert(l2 === 0 && s2 === 1)
    // malformed cell: FAILFAST, nothing loads
    Files.write(Paths.get(src, "bad.csv"),
      "v,id,d\ngamma,not-a-number,2024-03-04\n".getBytes)
    intercept[Exception](copy("ccv", "t", src, " FILEFORMAT = CSV"))
    assert(spark.table("ccv.ns.t").count() === 2L)
    Files.delete(Paths.get(src, "bad.csv"))
    // a drifted header hiding in the batch: refuse (extra column)
    Files.write(Paths.get(src, "drift.csv"),
      "v,id,d,extra\ndelta,9,2024-04-05,x\n".getBytes)
    val e = intercept[Exception](copy("ccv", "t", src,
      " FILEFORMAT = CSV"))
    assert(msgsOf(e).exists(m => m.contains("lacks") ||
      m.contains("CSV header")), e.getMessage)
    assert(spark.table("ccv.ns.t").count() === 2L)
  }

  test("FILEFORMAT = JSON: names resolve off the inferred schema, " +
      "string dates parse into DATE, lossy numeric drift refuses") {
    val wh = tmpDir("graft-copy-json")
    val src = tmpDir("graft-copy-json-src")
    durableCatalog("cjs", wh)
    spark.sql("CREATE TABLE cjs.ns.t (id BIGINT, v STRING, d DATE)")
    Files.write(Paths.get(src, "a.json"),
      ("""{"id": 1, "v": "alpha", "d": "2024-01-02"}""" + "\n" +
       """{"id": 2, "v": "beta", "d": "2024-02-03"}""" + "\n").getBytes)
    val (l1, _, r1) = copy("cjs", "t", src, " FILEFORMAT = JSON")
    assert((l1, r1) === ((1, 2L)))
    val got = spark.table("cjs.ns.t").orderBy("id")
      .selectExpr("id", "v", "CAST(d AS STRING)")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "alpha", "2024-01-02"),
      (2L, "beta", "2024-02-03")))
    // extra field: refuse
    Files.write(Paths.get(src, "extra.json"),
      ("""{"id": 3, "v": "x", "d": "2024-03-04", "zz": 1}""" + "\n")
        .getBytes)
    val e1 = intercept[Exception](copy("cjs", "t", src,
      " FILEFORMAT = JSON"))
    assert(msgsOf(e1).exists(_.contains("lacks")), e1.getMessage)
    Files.delete(Paths.get(src, "extra.json"))
    // lossy numeric drift (double into BIGINT): refuse
    Files.write(Paths.get(src, "lossy.json"),
      ("""{"id": 3.5, "v": "x", "d": "2024-03-04"}""" + "\n").getBytes)
    val e2 = intercept[Exception](copy("cjs", "t", src,
      " FILEFORMAT = JSON"))
    assert(msgsOf(e2).exists(_.contains("lossless")), e2.getMessage)
    assert(spark.table("cjs.ns.t").count() === 2L)
  }

  test("file identity is (path, size, mtime): a re-uploaded file with " +
      "new content loads again; FORCE reloads unchanged files") {
    val wh = tmpDir("graft-copy-ident")
    val src = tmpDir("graft-copy-ident-src")
    durableCatalog("cid", wh)
    spark.sql("CREATE TABLE cid.ns.t (id BIGINT, v STRING)")
    val f = Paths.get(src, "a.csv")
    Files.write(f, "id,v\n1,a\n".getBytes)
    assert(copy("cid", "t", src, " FILEFORMAT = CSV") === ((1, 0, 1L)))
    // overwrite IN PLACE with new content (and a guaranteed-new mtime)
    Files.write(f, "id,v\n2,b\n3,c\n".getBytes)
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 2000))
    val (l2, s2, r2) = copy("cid", "t", src, " FILEFORMAT = CSV")
    assert((l2, s2, r2) === ((1, 0, 2L)),
      "a changed file derives a new ledger key and loads again")
    assert(spark.table("cid.ns.t").select("id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L))
    // unchanged: skip … unless FORCE
    assert(copy("cid", "t", src, " FILEFORMAT = CSV") === ((0, 1, 0L)))
    val (l4, s4, r4) = copy("cid", "t", src, " FILEFORMAT = CSV FORCE")
    assert((l4, s4, r4) === ((1, 0, 2L)), "FORCE reloads regardless")
    assert(spark.table("cid.ns.t").count() === 5L,
      "FORCE duplicates by contract")
    // FORCE leaves the marks in place: the next plain run still skips
    assert(copy("cid", "t", src, " FILEFORMAT = CSV") === ((0, 1, 0L)))
  }

  test("paths with a hidden/marker component never load: a concurrent " +
      "writer's _temporary task attempts and .staging dirs are " +
      "invisible to the walk") {
    val wh = tmpDir("graft-copy-hidden")
    val src = tmpDir("graft-copy-hidden-src")
    durableCatalog("chd", wh)
    spark.sql("CREATE TABLE chd.ns.t (id BIGINT, v STRING)")
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/ok")
    // uncommitted task-attempt files under hidden COMPONENTS (the leaf
    // name itself is an ordinary part-*.parquet)
    Seq((99L, "spec")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/_temporary/0/task_1")
    Seq((98L, "stage")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$src/.staging/run")
    val (l1, s1, _) = copy("chd", "t", src)
    assert(l1 === 1 && s1 === 0,
      "only the committed file outside hidden dirs loads")
    assert(spark.table("chd.ns.t").select("id").as[Long]
      .collect().toSeq === Seq(1L))
  }

  test("fill-managed columns are not required of the source: an " +
      "identity + generated table COPYs, ids mint and the derived " +
      "column computes; the commit reads COPY INTO in the history") {
    val wh = tmpDir("graft-copy-fill")
    val src = tmpDir("graft-copy-fill-src")
    durableCatalog("cfl", wh)
    spark.sql(
      """CREATE TABLE cfl.ns.t (
        |  sk BIGINT GENERATED ALWAYS AS IDENTITY,
        |  n BIGINT,
        |  n2 BIGINT GENERATED ALWAYS AS (n * 2))""".stripMargin)
    Seq(Tuple1(7L), Tuple1(9L)).toDF("n").coalesce(1)
      .write.parquet(s"$src/b1")
    val (l1, _, r1) = copy("cfl", "t", src)
    assert((l1, r1) === ((1, 2L)))
    val rows = spark.table("cfl.ns.t")
      .select("sk", "n", "n2").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._2)
    assert(rows.map(_._2) === Seq(7L, 9L))
    assert(rows.map(_._3) === Seq(14L, 18L),
      "the generated column computes through the COPY")
    assert(rows.map(_._1).distinct.size === 2, "identity values mint")
    // the one commit is labeled COPY INTO (Delta's history surface)
    // and records its operationParameters (source dir, format, count)
    val hist = GraftMaintenance.sql(spark, "DESCRIBE HISTORY cfl.ns.t")
      .select("operation", "parameters").as[(String, String)]
      .collect().toSeq
    assert(hist.map(_._1).contains("COPY INTO"), hist.mkString(", "))
    val cp = hist.find(_._1 == "COPY INTO").get._2
    assert(cp.contains(s"source=$src") && cp.contains("fileformat=PARQUET")
      && cp.contains("n_files=1"), cp)
  }
}
