package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ALTER COLUMN … TYPE — lossless type WIDENING without a rewrite
  * (Delta's typeWidening / Iceberg's type promotion): the parquet
  * reader upcasts stored narrow values when the requested schema says
  * the wide type, so a widen costs a log entry, never a table rewrite. */
class GraftWidenSpec extends SparkSpec {
  import spark.implicits._

  private def graftTable(cat: String, ns: String, t: String): GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog].store.tables((Seq(ns), t))

  private def dataFiles(wh: String): Map[String, java.nio.file.attribute.FileTime] = {
    import scala.jdk.CollectionConverters._
    val dd = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .iterator().asScala.toSeq
      .find(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .get.resolve("data")
    val s = java.nio.file.Files.list(dd)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString ->
        java.nio.file.Files.getLastModifiedTime(p)).toMap
    finally s.close()
  }

  test("INT -> BIGINT widens metadata-only: no data file is touched, " +
      "post-widen inserts exceed Int range, zone skipping and blooms " +
      "keep working across the mixed files, restart folds it all back") {
    val wh = tmpDir("graft-widen")
    spark.conf.set("spark.sql.catalog.wd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wd.warehouse", wh)
    spark.sql("CREATE TABLE wd.ns.t (k INT, v STRING, f FLOAT) " +
      "TBLPROPERTIES ('bloom.columns'='k')")
    (0 until 100).map(i => (i, s"v$i", i / 2.0f)).toDF("k", "v", "f")
      .coalesce(1).writeTo("wd.ns.t").append()
    (100 until 200).map(i => (i, s"v$i", i / 2.0f)).toDF("k", "v", "f")
      .coalesce(1).writeTo("wd.ns.t").append()
    val before = dataFiles(wh)

    spark.sql("ALTER TABLE wd.ns.t ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE wd.ns.t ALTER COLUMN f TYPE DOUBLE")
    assert(dataFiles(wh) === before,
      "widening must not touch a single data file")
    val t = graftTable("wd", "ns", "t")
    assert(t.schema().fields(0).dataType ===
      org.apache.spark.sql.types.LongType)

    // post-widen values beyond Int range land beside the narrow files
    spark.sql("INSERT INTO wd.ns.t VALUES " +
      "(3000000000, 'big', 1.25), (3000000001, 'bigger', 2.5)")
    val got = spark.table("wd.ns.t").filter(col("k") > 150L)
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(got === ((151L until 200L) ++
      Seq(3000000000L, 3000000001L)).toSeq)
    // the filter pruned via converted zones: the first (0..99) file
    // never opens
    val c = t.lastScanCensus.get
    assert(c.filesRead < c.filesTotal,
      s"zone skipping must survive the widen: $c")
    // bloom point lookup with a LONG literal consults the narrow files'
    // filters (integral hashes are longValue-based — bit-identical)
    assert(spark.table("wd.ns.t").filter(col("k") === 7L).count() === 1L)
    val cb = t.lastScanCensus.get
    assert(cb.filesRead === 1,
      s"the pre-widen bloom must answer the wide lookup: $cb")
    // float column upcast on read
    assert(spark.table("wd.ns.t").filter(col("k") === 7L)
      .select("f").as[Double].head() === 3.5d)

    // restart: the fold re-binds the widened schema and types
    spark.conf.set("spark.sql.catalog.wdr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wdr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.wdr.warehouse.isolated", "true")
    val rt = graftTable("wdr", "ns", "t")
    assert(rt.schema().fields(0).dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.table("wdr.ns.t").agg(sum("k")).as[Long].head() ===
      (0L until 200L).sum + 3000000000L + 3000000001L)
    // time travel below the widen serves the NARROW schema
    val v1 = spark.sql("SELECT * FROM wdr.ns.t VERSION AS OF 1")
    assert(v1.schema.fields(0).dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(v1.count() === 100L)
  }

  test("CDF refuses to read across a widen (narrow representations " +
      "below it); a range constrained above serves; refusals: " +
      "narrowing, partition column, generated source; in-JVM rebuild") {
    val wh = tmpDir("graft-widenc")
    spark.conf.set("spark.sql.catalog.wdc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wdc.warehouse", wh)
    spark.sql("CREATE TABLE wdc.ns.t (k INT, p INT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO wdc.ns.t VALUES (1, 10), (2, 20)")    // v1
    spark.sql("ALTER TABLE wdc.ns.t ALTER COLUMN k TYPE BIGINT") // v2
    spark.sql("INSERT INTO wdc.ns.t VALUES (3000000000, 30)")    // v3
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    val e = intercept[Exception](
      spark.table("wdc.ns.`t$changes`").collect())
    assert(msgs(e).exists(_.contains("WIDEN COLUMN TYPE")), e.getMessage)
    // constrained above the widen: serves the wide rows
    val feed = spark.table("wdc.ns.`t$changes`")
      .filter(col("_commit_version") >= 3)
      .select("k").as[Long].collect().toSeq
    assert(feed === Seq(3000000000L))

    // refusals. NARROWING dies in Spark's analyzer (canUpCast) before
    // it ever reaches the catalog — also correct, different message
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE wdc.ns.t ALTER COLUMN k TYPE INT"))
    assert(msgs(e1).exists(_.contains("NOT_SUPPORTED_CHANGE_COLUMN")),
      e1.getMessage)
    // an analyzer-legal upcast OUTSIDE our metadata-only set (the
    // parquet reader cannot upcast int32 -> decimal here) refuses OURS
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE wdc.ns.t ALTER COLUMN k TYPE DECIMAL(20,0)"))
    assert(msgs(e2).exists(_.contains("lossless widenings")),
      e2.getMessage)
    // partition columns refuse (group keys are typed by the layout)
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE wdc.ns.t ALTER COLUMN p TYPE BIGINT"))
    assert(msgs(e4).exists(_.contains("partition/bucket column")),
      e4.getMessage)
    spark.sql("CREATE TABLE wdc.ns.g (n INT, " +
      "d BIGINT GENERATED ALWAYS AS (n * 2))")
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE wdc.ns.g ALTER COLUMN n TYPE BIGINT"))
    assert(msgs(e3).exists(_.contains("computes from it")), e3.getMessage)

    // in-JVM tables rebuild rows with the upcast (the test fast-path)
    spark.conf.set("spark.sql.catalog.wdj", classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE wdj.ns.wdj_t (k SMALLINT, v STRING)")
    spark.sql("INSERT INTO wdj.ns.wdj_t VALUES (7, 'a'), (9, 'b')")
    spark.sql("ALTER TABLE wdj.ns.wdj_t ALTER COLUMN k TYPE INT")
    spark.sql("INSERT INTO wdj.ns.wdj_t VALUES (70000, 'c')")
    assert(spark.table("wdj.ns.wdj_t").orderBy("k")
      .select("k").as[Int].collect().toSeq === Seq(7, 9, 70000))
    // INT -> DOUBLE is exact (< 2^53) and metadata-only too; LONG ->
    // DOUBLE is lossy above 2^53 and stays refused
    spark.sql("ALTER TABLE wdj.ns.wdj_t ALTER COLUMN k TYPE DOUBLE")
    assert(spark.table("wdj.ns.wdj_t").orderBy("k")
      .select("k").as[Double].collect().toSeq === Seq(7d, 9d, 70000d))
    spark.sql("CREATE TABLE wdj.ns.wdj_l (k BIGINT)")
    val e5 = intercept[Exception](spark.sql(
      "ALTER TABLE wdj.ns.wdj_l ALTER COLUMN k TYPE DOUBLE"))
    assert(msgs(e5).exists(m => m.contains("lossless widenings") ||
      m.contains("NOT_SUPPORTED_CHANGE_COLUMN")), e5.getMessage)
  }

  test("OPTIMIZE after a widen compacts narrow and wide segments into " +
      "wide ones; MOR delete vectors keyed pre-widen still apply") {
    val wh = tmpDir("graft-wideno")
    spark.conf.set("spark.sql.catalog.wdo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wdo.warehouse", wh)
    spark.sql("CREATE TABLE wdo.ns.t (k INT, v STRING) TBLPROPERTIES " +
      "('write.rowlevel.mode'='merge-on-read')")
    (0 until 50).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).writeTo("wdo.ns.t").append()
    // MOR delete BEFORE the widen: the DV rides the narrow file
    spark.sql("DELETE FROM wdo.ns.t WHERE k = 7")
    spark.sql("ALTER TABLE wdo.ns.t ALTER COLUMN k TYPE BIGINT")
    // the DV re-keyed onto the re-typed twin: the row stays deleted
    assert(spark.table("wdo.ns.t").filter(col("k") === 7L).count() === 0L)
    spark.sql("INSERT INTO wdo.ns.t VALUES (3000000000, 'big')")
    // compaction reads the narrow segment UPCAST and rebuilds wide
    GraftMaintenance.sql(spark, "OPTIMIZE wdo.ns.t").collect()
    val t = graftTable("wdo", "ns", "t")
    assert(t.filesSnapshot.forall(_.segment.schema.fields(0).dataType ===
      org.apache.spark.sql.types.LongType),
      "compacted segments must carry the wide layout")
    assert(spark.table("wdo.ns.t").agg(sum("k")).as[Long].head() ===
      (0L until 50L).sum - 7L + 3000000000L)
    // and a cold fold over the compacted state agrees
    spark.conf.set("spark.sql.catalog.wdor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wdor.warehouse", wh)
    spark.conf.set("spark.sql.catalog.wdor.warehouse.isolated", "true")
    assert(spark.table("wdor.ns.t").count() === 50L)
  }

  test("a streaming tail bound BEFORE the widen refuses at the widen " +
      "commit; a restarted (wide-bound) stream resumes from the same " +
      "checkpoint and reads pre-widen files upcast") {
    val wh = tmpDir("graft-widens")
    spark.conf.set("spark.sql.catalog.wds", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wds.warehouse", wh)
    spark.sql("CREATE TABLE wds.ns.t (k INT, v STRING)")
    spark.sql("INSERT INTO wds.ns.t VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("ALTER TABLE wds.ns.t ALTER COLUMN k TYPE BIGINT") // v2
    spark.sql("INSERT INTO wds.ns.t VALUES (3000000000, 'c')")   // v3
    // a FRESH wide-bound stream drains everything: v1's narrow files
    // serve UPCAST through the executor segment path, the widen commit
    // itself delivers nothing, v3's wide row lands
    val out = tmpDir("graft-widens-out")
    val ck = tmpDir("graft-widens-ck")
    val q = spark.readStream.table("wds.ns.t")
      .writeStream.format("parquet")
      .option("checkpointLocation", ck).option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    assert(spark.read.parquet(out).select("k").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3000000000L))
  }
}
