package graft.operators

import graft.SparkSpec
import graft.pipeline.Catalog
import org.apache.spark.sql.functions._

class WritersCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned append accumulates batches (bronze layout)") {
    val dir = tmpDir("bronze-append")
    val b1 = Seq((2023, 11, "06", 1.0), (2023, 11, "36", 2.0))
      .toDF("year", "month", "state", "v")
    val b2 = Seq((2023, 12, "06", 3.0)).toDF("year", "month", "state", "v")
    Writers.partitionedAppend(b1, dir, Seq("year", "month", "state"))
    Writers.partitionedAppend(b2, dir, Seq("year", "month", "state"))
    val got = spark.read.parquet(dir)
    assert(got.count() === 3)
    // partition pruning axis exists: year/month/state are partition columns
    assert(got.filter(col("month") === 12).count() === 1)
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val dir = tmpDir("bronze-dyn")
    val b1 = Seq((2023, 11, "06", 1.0), (2023, 11, "36", 2.0))
      .toDF("year", "month", "state", "v")
    Writers.partitionedDynamicOverwrite(b1, dir, Seq("year", "month", "state"))
    // re-ingest only state 06 with a corrected value
    val fix = Seq((2023, 11, "06", 9.0)).toDF("year", "month", "state", "v")
    Writers.partitionedDynamicOverwrite(fix, dir, Seq("year", "month", "state"))
    val got = spark.read.parquet(dir).orderBy("state")
      .collect().map(r => (r.getAs[String]("state"), r.getAs[Double]("v")))
    assert(got.toSeq === Seq(("06", 9.0), ("36", 2.0)))
  }

  test("catalog overwrite swaps atomically and is re-runnable") {
    val t1 = Seq((1, "a")).toDF("id", "v")
    Catalog.overwriteTable(spark, t1, "swap_test")
    assert(spark.table("swap_test").count() === 1)
    val t2 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Catalog.overwriteTable(spark, t2, "swap_test")
    assert(spark.table("swap_test").count() === 2)
    assert(!spark.catalog.tableExists("swap_test__staging"))
  }
}
