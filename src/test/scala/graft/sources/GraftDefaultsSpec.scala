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

  test("ALTER ADD COLUMN with a DEFAULT refuses loudly (EXISTS_DEFAULT " +
      "would require reader-side backfill)") {
    spark.conf.set("spark.sql.catalog.dfh", classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE dfh.ns.dfh_t (id BIGINT)")
    spark.sql("INSERT INTO dfh.ns.dfh_t VALUES (1)")
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE dfh.ns.dfh_t ADD COLUMN s STRING DEFAULT 'x'"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("may not carry a DEFAULT")), e)
    // a plain nullable ADD COLUMN still works
    spark.sql("ALTER TABLE dfh.ns.dfh_t ADD COLUMN s STRING")
    assert(spark.table("dfh.ns.dfh_t").columns.toSeq === Seq("id", "s"))
  }
}
