package graft.functions

import graft.SparkSpec
import graft.plans.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native bounded-heap `topk` aggregate must agree exactly with the
  * window formulation it replaces, across partial/final merge boundaries
  * (shuffled input exercises serialize/deserialize). */
class TopKAggSpec extends SparkSpec {

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
                         k: Int): Map[String, Seq[Double]] = {
    val w = Window.partitionBy("g").orderBy(desc("v"))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted.reverse.toSeq }
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame,
                       k: Int): Map[String, Seq[Double]] = {
    df.groupBy("g").agg(GraftFunctions.topK(col("v"), k).as("tk"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .toMap
  }

  test("topk matches the window formulation on random shuffled data") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      (s"g${i % 7}", rnd.nextDouble() * 1000)
    }
    import spark.implicits._
    // repartition(13) forces partial heaps on every partition and a
    // merge-with-deserialize at the final aggregation
    val df = rows.toDF("g", "v").repartition(13)
    assert(heapTopK(df, 5) == windowTopK(df, 5))
    assert(heapTopK(df, 1) == windowTopK(df, 1))
  }

  test("k larger than the group returns the whole group, descending") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq(("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 9.0))
      .toDF("g", "v").repartition(4)
    val got = heapTopK(df, 10)
    assert(got("a") == Seq(3.0, 2.0, 1.0))
    assert(got("b") == Seq(9.0))
  }

  test("ties at the boundary yield the tied value, nulls are skipped") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq(("a", Some(5.0)), ("a", Some(5.0)), ("a", Some(5.0)),
      ("a", Some(4.0)), ("a", None))
      .toDF("g", "v").repartition(3)
    assert(heapTopK(df, 2)("a") == Seq(5.0, 5.0))
    assert(heapTopK(df, 4)("a") == Seq(5.0, 5.0, 5.0, 4.0))
  }

  test("topk is usable from SQL") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a", 1.0), ("a", 7.0), ("a", 3.0)).toDF("g", "v")
      .createOrReplaceTempView("tk_in")
    val got = spark.sql("SELECT g, topk(v, 2) AS tk FROM tk_in GROUP BY g")
      .collect().head.getSeq[Double](1)
    assert(got == Seq(7.0, 3.0))
  }
}
