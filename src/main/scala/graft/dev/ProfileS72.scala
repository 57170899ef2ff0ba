package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev-only: decompose s72_cluster_by (3 appends + OPTIMIZE + probes)
  * and s44_stream_cdf (CTAS + UPDATE + 2 stream drains + DELETE) so the
  * write-path optimization targets the measured stage. */
object ProfileS72 {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-profwh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r s72")
      val wh = java.nio.file.Files.createTempDirectory("graft-s72p").toString
      val w = s"gclp_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.conf.set(s"spark.sql.catalog.$w",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$w.warehouse", wh)
      spark.sql(s"CREATE TABLE $w.ns.pts (x BIGINT, y BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('cluster.by'='x,y')")
      val pts = Tables.lineitem(spark, dir)
        .select(col("l_partkey").cast("long").as("x"),
          col("l_suppkey").cast("long").as("y"),
          col("l_orderkey").cast("long").as("v"))
      (0 until 3).foreach(i =>
        t(s"append $i")(
          pts.filter(col("v") % 3 === i).writeTo(s"$w.ns.pts").append()))
      t("OPTIMIZE")(graft.sources.GraftMaintenance
        .sql(spark, s"OPTIMIZE $w.ns.pts").collect())
      t("box probe")(spark.table(s"$w.ns.pts")
        .filter(col("x").between(100, 300) && col("y").between(10, 60))
        .agg(count(lit(1)), sum(col("v"))).collect())
      t("history probe")(spark.table(s"$w.ns.`pts$$history`").count())
      println(s"--- rep $r s44")
      val t44 = s"$w.ns.s44_t"; val acc = s"$w.ns.s44_acc"
      val TFh = graft.functions.TextFunctions
      t("CTAS")(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("double").as("price"),
          pmod(TFh.polyHash(concat(lit("cd|"),
            col("o_orderkey").cast("string"))), lit(4L))
            .cast("int").as("h"),
          year(col("o_orderdate")).as("yr"))
        .writeTo(t44).partitionedBy(col("h")).create())
      t("UPDATE")(spark.sql(
        s"UPDATE $t44 SET price = price * 1.1 WHERE h = 0 AND yr < 1995"))
      spark.sql(s"CREATE TABLE $acc (sign INT, price DOUBLE)")
      val ckpt = graft.analytics.TempDirs.scratch("s44p-ckpt")
      def drain(tag: String): Unit = t(s"drain $tag") {
        val q = spark.readStream.table(s"$w.ns.`s44_t$$changes`")
          .select(when(col("_change_type") === "insert", 1).otherwise(-1)
            .as("sign"), col("price"))
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(acc)
        q.awaitTermination()
      }
      drain("1")
      t("DELETE")(spark.sql(s"DELETE FROM $t44 WHERE h = 3"))
      drain("2")
      t("final agg")(spark.table(acc).agg(
        sum(col("sign")), sum(col("price"))).collect())
    }
    spark.stop()
  }
}
