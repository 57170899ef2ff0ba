package graft.sources

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 FunctionCatalog surface: `graft_cat.ns.poly_hash` /
  * `graft_cat.ns.vec_dot` resolve for any session with the catalog
  * configured (no per-session registration), agree bit-for-bit with the
  * session-registered expressions, handle the null algebra, and reject
  * bad signatures at analysis. */
class GraftFunctionCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)

  test("poly_hash resolves as a catalog function and matches the kernel " +
      "and the session-registered expression") {
    withCatalog()
    val got = spark.sql(
      "SELECT graft_cat.ns.poly_hash('abc') AS h").as[Long].head()
    assert(got === graft.plans.PolyHashExpr.hash(UTF8String.fromString("abc")))

    // parity with the session route over a real column
    val df = Seq("", "a", "abc", "Hello, world", "ζω").toDF("s")
    df.createOrReplaceTempView("fc_strings")
    val pairs = spark.sql(
      "SELECT graft_cat.ns.poly_hash(s) AS cat, poly_hash(s) AS ses " +
        "FROM fc_strings").as[(Long, Long)].collect()
    assert(pairs.forall(p => p._1 == p._2), pairs.mkString(", "))

    // null algebra
    assert(spark.sql("SELECT graft_cat.ns.poly_hash(CAST(NULL AS STRING))")
      .head().isNullAt(0))
  }

  test("vec_dot resolves as a catalog function with the expression's " +
      "null algebra") {
    withCatalog()
    assert(spark.sql(
      "SELECT graft_cat.ns.vec_dot(array(1d,2d,3d), array(4d,5d,6d))")
      .as[Double].head() === 32.0)
    // length mismatch and null element → NULL (the zip_with algebra)
    assert(spark.sql(
      "SELECT graft_cat.ns.vec_dot(array(1d,2d), array(1d))")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT graft_cat.ns.vec_dot(array(1d,CAST(NULL AS DOUBLE)), array(1d,2d))")
      .head().isNullAt(0))
    // parity with the session route
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0)),
      (Array(0.5, -1.0), Array(2.0, 2.0))).toDF("a", "b")
    df.createOrReplaceTempView("fc_vecs")
    val pairs = spark.sql(
      "SELECT graft_cat.ns.vec_dot(a, b) AS cat, vec_dot(a, b) AS ses " +
        "FROM fc_vecs").as[(Double, Double)].collect()
    assert(pairs.forall(p => p._1 == p._2))
  }

  test("bad signatures and unknown functions fail at analysis") {
    withCatalog()
    intercept[Exception](
      spark.sql("SELECT graft_cat.ns.poly_hash(1, 2)").collect())
    intercept[Exception](
      spark.sql("SELECT graft_cat.ns.vec_dot(array(1d), 'x')").collect())
    intercept[Exception](
      spark.sql("SELECT graft_cat.ns.no_such_fn(1)").collect())
    // discovery surface (bucket is the partition-transform function)
    assert(new GraftCatalog().listFunctions(Array("ns")).map(_.name()).toSet
      === Set("poly_hash", "vec_dot", "bucket"))
  }
}
