package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: isolate erratic latencies — repeated identical query vs pure
  * CPU loop, to tell Spark pathology from VM throttling. */
object Probe {
  def busyMs(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0
    while (i < 200000000) { x += i * 31; i += 1 }
    if (x == 42) println("")
    (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for (i <- 1 to 8) {
      val b0 = busyMs()
      var t0 = System.nanoTime()
      c.count()
      val tCount = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      c.join(o.select(o("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti").count()
      val tAnti = (System.nanoTime() - t0) / 1e9
      val b1 = busyMs()
      println(f"iter $i: busy=${b0}%6.0f/${b1}%6.0fms count=$tCount%6.2fs anti=$tAnti%6.2fs")
    }
    spark.stop()
  }
}
