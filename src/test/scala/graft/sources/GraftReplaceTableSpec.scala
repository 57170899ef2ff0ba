package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** REPLACE TABLE / CREATE OR REPLACE TABLE AS on the durable catalog:
  * a non-staging DSv2 catalog serves Spark's documented DROP+CREATE
  * fallback. These pins define OUR semantics for it: the replacement's
  * schema and data land, the OLD table's dir (and so its history) is
  * destroyed with the drop — no orphan dirs accumulate across repeated
  * REPLACE — and a fresh process folds the replacement, never the
  * predecessor. Delta's atomic variant (StagingTableCatalog) is the
  * documented upgrade path behind the same SQL surface. */
class GraftReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE OR REPLACE TABLE AS on the durable catalog: replacement " +
      "schema+data land, the predecessor's dir is destroyed, restart " +
      "folds the replacement") {
    val wh = tmpDir("graft-rtas")
    spark.conf.set("spark.sql.catalog.rtd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtd.warehouse", wh)
    spark.sql("CREATE TABLE rtd.ns.t_rp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rtd.ns.t_rp VALUES (1, 'a'), (2, 'b')")
    def dirs: Seq[String] = {
      import scala.jdk.CollectionConverters._
      val l = Files.list(Paths.get(wh))
      try l.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally l.close()
    }
    val before = dirs
    spark.sql("CREATE OR REPLACE TABLE rtd.ns.t_rp AS " +
      "SELECT CAST(9 AS BIGINT) AS total")
    assert(spark.sql("SELECT total FROM rtd.ns.t_rp").as[Long].head()
      === 9L, "the replacement's schema and data must serve")
    // repeated REPLACE: no orphan dirs pile up (drop destroys the dir,
    // so the plain name is re-allocatable every time)
    spark.sql("REPLACE TABLE rtd.ns.t_rp AS SELECT CAST(10 AS BIGINT) AS total")
    assert(dirs.length === before.length,
      s"repeated REPLACE must not accumulate table dirs: $dirs")
    // a fresh process folds the replacement, never the predecessor
    spark.conf.set("spark.sql.catalog.rtd2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtd2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.rtd2.warehouse.isolated", "true")
    assert(spark.sql("SELECT total FROM rtd2.ns.t_rp").as[Long].head()
      === 10L)
    // the predecessor's history died with it: the replacement's log is
    // just its own CTAS (v0 create + v1 data — REPLACE here is
    // drop+create, not Delta's history-preserving replace; pinned so
    // the contract is explicit)
    assert(spark.sql("SELECT min(version), max(version), count(*) " +
      "FROM rtd.ns.`t_rp$history`").as[(Int, Int, Long)].head()
      === ((0, 1, 2L)))
  }
}
