package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for every registered query so
  * pushdown (PushedFilters/ReadSchema), join strategies, and exchange
  * counts can be reviewed. Usage: runMain graft.dev.Explain [queryName]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.001"
    val only = args.headOption
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_ == q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          println(plan)
        } catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
