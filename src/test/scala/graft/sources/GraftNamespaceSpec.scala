package graft.sources

import graft.SparkSpec

/** Namespace management (`SupportsNamespaces`): declared namespaces and
  * ones implied by existing tables both list/resolve; DROP refuses a
  * populated namespace without CASCADE and removes its tables with it. */
class GraftNamespaceSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)

  test("create, list, and show namespaces — declared and implied") {
    withCatalog()
    spark.sql("DROP NAMESPACE IF EXISTS graft_cat.nsdecl CASCADE")
    spark.sql("CREATE NAMESPACE graft_cat.nsdecl")
    intercept[Exception](spark.sql("CREATE NAMESPACE graft_cat.nsdecl"))
    val listed = spark.sql("SHOW NAMESPACES IN graft_cat")
      .as[String].collect().toSet
    assert(listed.contains("nsdecl"))
    // a table implies its namespace without declaration
    spark.sql("DROP TABLE IF EXISTS graft_cat.nsimplied.t1")
    Seq((1L, "a")).toDF("id", "v")
      .writeTo("graft_cat.nsimplied.t1").create()
    assert(spark.sql("SHOW NAMESPACES IN graft_cat")
      .as[String].collect().toSet.contains("nsimplied"))
    assert(spark.sql("SHOW TABLES IN graft_cat.nsimplied")
      .select("tableName").as[String].collect().toSeq === Seq("t1"))
  }

  test("drop namespace: empty drops, populated needs CASCADE, cascade " +
      "removes the tables") {
    withCatalog()
    spark.sql("DROP NAMESPACE IF EXISTS graft_cat.nsdrop CASCADE")
    spark.sql("CREATE NAMESPACE graft_cat.nsdrop")
    Seq((1L, "a")).toDF("id", "v")
      .writeTo("graft_cat.nsdrop.t1").create()
    intercept[Exception](spark.sql("DROP NAMESPACE graft_cat.nsdrop"))
    assert(spark.table("graft_cat.nsdrop.t1").count() === 1)
    spark.sql("DROP NAMESPACE graft_cat.nsdrop CASCADE")
    intercept[Exception](spark.table("graft_cat.nsdrop.t1").collect())
    assert(!spark.sql("SHOW NAMESPACES IN graft_cat")
      .as[String].collect().toSet.contains("nsdrop"))

    // RESTRICT also refuses a namespace holding declared CHILDREN, and
    // the children survive the refusal
    spark.sql("DROP NAMESPACE IF EXISTS graft_cat.nsparent CASCADE")
    spark.sql("CREATE NAMESPACE graft_cat.nsparent")
    spark.sql("CREATE NAMESPACE graft_cat.nsparent.child")
    intercept[Exception](spark.sql("DROP NAMESPACE graft_cat.nsparent"))
    assert(new GraftCatalog().namespaceExists(Array("nsparent", "child")))
    spark.sql("DROP NAMESPACE graft_cat.nsparent CASCADE")
    assert(!new GraftCatalog().namespaceExists(Array("nsparent")))
  }
}
