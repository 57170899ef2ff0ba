package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** ATOMIC staged REPLACE TABLE (StagingTableCatalog — Delta's
  * history-preserving replace). The pins that define the contract:
  *  - the swap is ONE commit on the TARGET's own log: the predecessor's
  *    history stays retained, time travel to pre-replace versions
  *    serves the old schema and data;
  *  - until the swap entry lands, readers and crashes see the OLD
  *    table — a stage abandoned mid-flight is invisible to a fresh
  *    fold and is swept by VACUUM;
  *  - repeated REPLACE accumulates no dirs (the stage nests inside the
  *    target dir; its segments RENAME into `data/` at commit);
  *  - the change feed refuses to read across the swap (pre/post field
  *    ids are disjoint by seeding), batch and streaming alike, while a
  *    range constrained above it still serves. */
class GraftReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  private def dirsIn(path: String): Seq[String] = {
    val l = Files.list(Paths.get(path))
    try l.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    finally l.close()
  }

  test("CREATE OR REPLACE TABLE AS is an atomic staged swap: the " +
      "replacement lands as ONE commit, history is preserved, time " +
      "travel serves the predecessor, restart folds the replacement") {
    val wh = tmpDir("graft-rtas")
    spark.conf.set("spark.sql.catalog.rtd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtd.warehouse", wh)
    spark.sql("CREATE TABLE rtd.ns.trp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rtd.ns.trp VALUES (1, 'a'), (2, 'b')")
    val before = dirsIn(wh)
    spark.sql("CREATE OR REPLACE TABLE rtd.ns.trp AS " +
      "SELECT CAST(9 AS BIGINT) AS total")
    assert(spark.sql("SELECT total FROM rtd.ns.trp").as[Long].head()
      === 9L, "the replacement's schema and data must serve")
    // repeated REPLACE: the stage nests inside the target dir and its
    // segments rename into data/ — no dirs pile up, no stage remains
    spark.sql("REPLACE TABLE rtd.ns.trp AS SELECT CAST(10 AS BIGINT) AS total")
    assert(dirsIn(wh) === before,
      s"repeated REPLACE must not change the warehouse's dirs: ${dirsIn(wh)}")
    val tableDir = before.find(_.contains("trp")).get
    assert(!dirsIn(s"$wh/$tableDir").exists(_.startsWith("stage-")),
      "a committed replace must leave no stage dir behind")
    // HISTORY-PRESERVING: v0 create, v1 insert, v2 replace, v3 replace
    assert(spark.sql("SELECT min(version), max(version), count(*) " +
      "FROM rtd.ns.`trp$history`").as[(Int, Int, Long)].head()
      === ((0, 3, 4L)))
    // time travel ACROSS the replace: v1 serves the predecessor's
    // schema and rows
    assert(spark.sql("SELECT id, v FROM rtd.ns.trp VERSION AS OF 1 " +
      "ORDER BY id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b")))
    // a fresh process folds the CURRENT state (swap entry + both
    // replaced censuses) from the one continuous log
    spark.conf.set("spark.sql.catalog.rtd2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtd2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.rtd2.warehouse.isolated", "true")
    assert(spark.sql("SELECT total FROM rtd2.ns.trp").as[Long].head()
      === 10L)
    assert(spark.sql("SELECT id FROM rtd2.ns.trp VERSION AS OF 1 " +
      "ORDER BY id").as[Long].collect().toSeq === Seq(1L, 2L),
      "the restarted fold must still time-travel across the replace")
  }

  test("a stage abandoned mid-replace (crash) leaves the old table " +
      "serving, is invisible to a fresh fold, and VACUUM sweeps it") {
    val wh = tmpDir("graft-rstage")
    spark.conf.set("spark.sql.catalog.rtc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtc.warehouse", wh)
    spark.sql("CREATE TABLE rtc.ns.tcr (id BIGINT)")
    spark.sql("INSERT INTO rtc.ns.tcr VALUES (7)")
    // stage a replacement through the catalog API and DON'T commit —
    // the crash-before-commit state
    val cat = new GraftCatalog
    cat.initialize("rtc_api", new CaseInsensitiveStringMap(
      Map("warehouse" -> wh).asJava))
    cat.stageReplace(Identifier.of(Array("ns"), "tcr"),
      StructType(Seq(StructField("total", LongType))),
      Array.empty, new java.util.HashMap[String, String]())
    val tableDir = dirsIn(wh).find(_.contains("tcr")).get
    assert(dirsIn(s"$wh/$tableDir").exists(_.startsWith("stage-")),
      "the stage dir must exist while staged")
    // the OLD table serves throughout — same catalog and a fresh fold
    assert(spark.sql("SELECT id FROM rtc.ns.tcr").as[Long].head() === 7L)
    spark.conf.set("spark.sql.catalog.rtc2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtc2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.rtc2.warehouse.isolated", "true")
    assert(spark.sql("SELECT id FROM rtc2.ns.tcr").as[Long].head() === 7L,
      "a fresh fold must see the old table, never the abandoned stage")
    // explicit VACUUM sweeps the abandoned stage (minAge-0 reclaim)
    GraftMaintenance.sql(spark, "VACUUM rtc.ns.tcr")
    assert(!dirsIn(s"$wh/$tableDir").exists(_.startsWith("stage-")),
      "VACUUM must sweep the abandoned stage dir")
    assert(spark.sql("SELECT id FROM rtc.ns.tcr").as[Long].head() === 7L)
  }

  test("the change feed refuses to read across a REPLACE (batch and " +
      "streaming); a range constrained above the swap still serves") {
    val wh = tmpDir("graft-rcdf")
    spark.conf.set("spark.sql.catalog.rcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcf.warehouse", wh)
    spark.sql("CREATE TABLE rcf.ns.tcf (id BIGINT)")         // v0
    spark.sql("INSERT INTO rcf.ns.tcf VALUES (1), (2)")      // v1
    spark.sql("CREATE OR REPLACE TABLE rcf.ns.tcf AS " +      // v2 swap
      "SELECT CAST(5 AS BIGINT) AS total")
    spark.sql("INSERT INTO rcf.ns.tcf VALUES (6)")           // v3
    // unbounded batch read crosses the swap → refused at plan time
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM rcf.ns.`tcf$changes`").collect()
    }
    assert(e1.getMessage.contains("REPLACE TABLE"),
      s"refusal must name the replace: ${e1.getMessage}")
    // a range proven above the swap serves the post-replace changes
    val above = spark.sql("SELECT _change_type, _commit_version, total " +
      "FROM rcf.ns.`tcf$changes` WHERE _commit_version >= 3")
      .as[(String, Int, Long)].collect().toSeq.sorted
    assert(above === Seq(("insert", 3, 6L)))
    // streaming CDF from the initial position crosses the swap → the
    // stream fails loudly instead of serving null-padded preimages
    val out = tmpDir("graft-rcdf-out")
    val ck = tmpDir("graft-rcdf-ck")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.table("rcf.ns.`tcf$changes`")
        .writeStream.format("parquet")
        .option("checkpointLocation", ck).option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(err.getMessage.contains("REPLACE TABLE") ||
      Option(err.getCause).exists(_.getMessage.contains("REPLACE TABLE")),
      s"the stream must refuse across the swap: ${err.getMessage}")
    // startingVersion above the swap streams cleanly
    val out2 = tmpDir("graft-rcdf-out2")
    val ck2 = tmpDir("graft-rcdf-ck2")
    val q2 = spark.readStream.option("startingVersion", "3")
      .table("rcf.ns.`tcf$changes`")
      .writeStream.format("parquet")
      .option("checkpointLocation", ck2).option("path", out2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out2).count() === 1L)
  }

  test("a REPLACE that CHANGES the partitioning threads the layout " +
      "through checkpoints and folds: post-replace partition ops and " +
      "pre-replace time travel both bind the right group keys") {
    val savedK = GraftTable.checkpointInterval
    try {
      GraftTable.checkpointInterval = 3 // checkpoints fire mid-sequence
      val wh = tmpDir("graft-rlay")
      spark.conf.set("spark.sql.catalog.rly", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.rly.warehouse", wh)
      // predecessor: partitioned by p
      spark.sql("CREATE TABLE rly.ns.tl (id BIGINT, p STRING) " +
        "PARTITIONED BY (p)")                                    // v0
      spark.sql("INSERT INTO rly.ns.tl VALUES (1, 'x'), (2, 'y')") // v1
      spark.sql("INSERT INTO rly.ns.tl VALUES (3, 'x')")           // v2
      // replacement: DIFFERENT layout (partitioned by q)
      spark.sql("CREATE OR REPLACE TABLE rly.ns.tl " +
        "PARTITIONED BY (q) AS " +
        "SELECT CAST(10 AS BIGINT) AS id, 'a' AS q UNION ALL " +
        "SELECT CAST(11 AS BIGINT), 'b'")                          // v3
      // post-replace commits drive past a checkpoint (v3 swap + these)
      spark.sql("INSERT INTO rly.ns.tl VALUES (12, 'a')")          // v4
      spark.sql("INSERT INTO rly.ns.tl VALUES (13, 'b')")          // v5
      spark.sql("INSERT INTO rly.ns.tl VALUES (14, 'a')")          // v6
      // partition-scoped COW op under the NEW layout
      spark.sql("UPDATE rly.ns.tl SET id = id + 100 WHERE q = 'b'") // v7
      assert(spark.sql("SELECT id FROM rly.ns.tl ORDER BY id")
        .as[Long].collect().toSeq === Seq(10L, 12L, 14L, 111L, 113L))
      // pre-replace time travel binds the OLD layout's group keys
      assert(spark.sql("SELECT id FROM rly.ns.tl VERSION AS OF 2 " +
        "WHERE p = 'x' ORDER BY id").as[Long].collect().toSeq
        === Seq(1L, 3L))
      // a COLD fold (checkpoint + tail, layout threaded from the swap
      // entry / post-replace checkpoint) agrees on everything
      spark.conf.set("spark.sql.catalog.rly2", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.rly2.warehouse", wh)
      spark.conf.set("spark.sql.catalog.rly2.warehouse.isolated", "true")
      assert(spark.sql("SELECT id FROM rly2.ns.tl ORDER BY id")
        .as[Long].collect().toSeq === Seq(10L, 12L, 14L, 111L, 113L))
      assert(spark.sql("SELECT q, count(*) FROM rly2.ns.tl GROUP BY q " +
        "ORDER BY q").as[(String, Long)].collect().toSeq
        === Seq(("a", 3L), ("b", 2L)))
      assert(spark.sql("SELECT id FROM rly2.ns.tl VERSION AS OF 1 " +
        "ORDER BY id").as[Long].collect().toSeq === Seq(1L, 2L))
      // the reopened table keeps doing partition-scoped work
      spark.sql("DELETE FROM rly2.ns.tl WHERE q = 'a'")
      assert(spark.sql("SELECT id FROM rly2.ns.tl ORDER BY id")
        .as[Long].collect().toSeq === Seq(111L, 113L))
    } finally GraftTable.checkpointInterval = savedK
  }

  test("an in-JVM (heap) catalog replaces atomically too, with the " +
      "same preserved history") {
    spark.conf.set("spark.sql.catalog.rmem", classOf[GraftCatalog].getName)
    val tag = java.util.UUID.randomUUID().toString.take(6)
    spark.sql(s"CREATE TABLE rmem.ns.tm$tag (id BIGINT)")
    spark.sql(s"INSERT INTO rmem.ns.tm$tag VALUES (1)")
    spark.sql(s"CREATE OR REPLACE TABLE rmem.ns.tm$tag AS " +
      "SELECT CAST(4 AS BIGINT) AS total")
    assert(spark.sql(s"SELECT total FROM rmem.ns.tm$tag")
      .as[Long].head() === 4L)
    assert(spark.sql("SELECT min(version), max(version), count(*) " +
      s"FROM rmem.ns.`tm$tag$$history`").as[(Int, Int, Long)].head()
      === ((0, 2, 3L)))
    assert(spark.sql(s"SELECT id FROM rmem.ns.tm$tag VERSION AS OF 1")
      .as[Long].head() === 1L)
  }
}
