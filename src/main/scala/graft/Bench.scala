package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.registerAll(spark)
    // Warmup pass (untimed): the first ~90s of JVM life are dominated by
    // JIT + whole-stage-codegen (janino) compilation, which would otherwise
    // be billed to whichever queries happen to run first. One full pass
    // compiles every plan's generated code; the timed pass then measures
    // steady-state execution, as a long-lived cluster would see.
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench:warmup] $name failed: $e")
      }
      graft.analytics.Caches.release()
    }
    // Timed pass: best of 2 — this host shows sporadic multi-second stalls
    // unrelated to the workload; the minimum is the reproducible cost.
    // A failing query is reported loudly and billed at a 9999 s sentinel
    // (finite, so the JSON stays parseable) so it cannot flatter the total.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: $e")
              false
          }
        graft.analytics.Caches.release()
        if (ok) (System.nanoTime() - t0) / 1e9 else 9999.0
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
