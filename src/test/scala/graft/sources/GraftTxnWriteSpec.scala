package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Idempotent writer transactions (Delta's `txnAppId`/`txnVersion`
  * write options): the batch write path shares the streaming sink's
  * persisted exactly-once ledger, so a retried batch under the same
  * (app, version) is recognized INSIDE the commit lease and skipped —
  * across retries in one process, across a restart (the ledger rides
  * every log entry), and independently per writer app. */
class GraftTxnWriteSpec extends SparkSpec {
  import spark.implicits._

  private def catalog(name: String, wh: String,
                      isolated: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  private def graftTable(cat: String, ns: String, t: String): GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog].store.tables((Seq(ns), t))

  private def put(table: String, app: String, v: Long,
                  ids: Long*): Unit =
    ids.toDF("id").writeTo(table)
      .option("txnAppId", app).option("txnVersion", v.toString)
      .append()

  test("a retried (app, version) batch applies exactly once; apps " +
      "have independent high-waters; the ledger survives restart") {
    val wh = tmpDir("graft-txn")
    catalog("txw", wh)
    spark.sql("CREATE TABLE txw.ns.t (id BIGINT)")
    put("txw.ns.t", "loader", 1, 1L, 2L)
    put("txw.ns.t", "loader", 1, 1L, 2L) // retry: skipped
    put("txw.ns.t", "loader", 2, 3L)
    put("txw.ns.t", "loader", 1, 1L, 2L) // below high-water: skipped
    put("txw.ns.t", "backfill", 1, 4L)   // other app's v1: applies
    assert(spark.table("txw.ns.t").orderBy("id").as[Long].collect().toSeq
      === Seq(1L, 2L, 3L, 4L))
    assert(graftTable("txw", "ns", "t").latestTxnVersion("loader") === 2L)
    assert(graftTable("txw", "ns", "t").latestTxnVersion("backfill") === 1L)
    assert(graftTable("txw", "ns", "t").latestTxnVersion("never") === -1L)

    // restart: a cold fold restores the ledger, so the replayed v2 is
    // recognized by a FRESH catalog over the same warehouse
    catalog("txr", wh, isolated = true)
    put("txr.ns.t", "loader", 2, 99L) // replay after restart: skipped
    assert(spark.table("txr.ns.t").orderBy("id").as[Long].collect().toSeq
      === Seq(1L, 2L, 3L, 4L))
    assert(graftTable("txr", "ns", "t").latestTxnVersion("loader") === 2L)
    // the resumed writer continues past its high-water
    put("txr.ns.t", "loader", 3, 5L)
    assert(spark.table("txr.ns.t").count() === 5L)
  }

  test("a skipped replay reclaims its task-written segments instead " +
      "of orphaning them") {
    val wh = tmpDir("graft-txno")
    catalog("txo", wh)
    spark.sql("CREATE TABLE txo.ns.t (id BIGINT)")
    put("txo.ns.t", "app", 1, 1L, 2L, 3L)
    def segments(): Long = {
      val dir = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
        .filter(p => java.nio.file.Files.isRegularFile(
          p.resolve("table.json"))).findFirst().orElseThrow()
      java.nio.file.Files.walk(dir).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).count()
    }
    val before = segments()
    put("txo.ns.t", "app", 1, 1L, 2L, 3L) // skipped replay
    assert(segments() === before,
      "the skipped write's fresh segments must be reclaimed at once")
  }

  test("txnAppId without txnVersion (and vice versa) refuses loudly") {
    val wh = tmpDir("graft-txnb")
    catalog("txb", wh)
    spark.sql("CREATE TABLE txb.ns.t (id BIGINT)")
    val e1 = intercept[Exception] {
      Seq(1L).toDF("id").writeTo("txb.ns.t")
        .option("txnAppId", "app").append()
    }
    assert(e1.getMessage.contains("txnVersion") ||
      Option(e1.getCause).exists(_.getMessage.contains("txnVersion")))
    val e2 = intercept[Exception] {
      Seq(1L).toDF("id").writeTo("txb.ns.t")
        .option("txnVersion", "1").append()
    }
    assert(e2.getMessage.contains("txnAppId") ||
      Option(e2.getCause).exists(_.getMessage.contains("txnAppId")))
  }

  test("txn options guard overwrites too, and an in-JVM (heap) table " +
      "gets the same in-process idempotence") {
    // heap catalog: no warehouse — the ledger is in-memory only, but a
    // retry inside one process still converges
    spark.conf.set("spark.sql.catalog.txh", classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE txh.ns.txh_t (id BIGINT)")
    put("txh.ns.txh_t", "a", 1, 1L)
    put("txh.ns.txh_t", "a", 1, 1L)
    assert(spark.table("txh.ns.txh_t").count() === 1L)
    // idempotent INSERT OVERWRITE: the second truncate-write is skipped
    Seq(7L, 8L).toDF("id").writeTo("txh.ns.txh_t")
      .option("txnAppId", "a").option("txnVersion", "2")
      .overwritePartitions()
    Seq(9L).toDF("id").writeTo("txh.ns.txh_t")
      .option("txnAppId", "a").option("txnVersion", "2")
      .overwritePartitions() // replayed overwrite: skipped
    assert(spark.table("txh.ns.txh_t").orderBy("id").as[Long].collect().toSeq
      === Seq(7L, 8L))
  }
}
