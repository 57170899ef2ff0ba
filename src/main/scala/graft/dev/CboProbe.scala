package graft.dev
import org.apache.spark.sql.SparkSession
object CboProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.cbo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql("CREATE TABLE cbo.ns.cbo_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO cbo.ns.cbo_t VALUES (1,'a'),(2,'b'),(3,'c')")
    val df = spark.table("cbo.ns.cbo_t").filter("id > 1")
    val stats = df.queryExecution.optimizedPlan.stats
    println("SIZE=" + stats.sizeInBytes + " ROWS=" + stats.rowCount)
    println("ATTRSTATS=" + stats.attributeStats)
  }
}
