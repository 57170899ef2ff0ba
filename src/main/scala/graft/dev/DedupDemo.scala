package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: drive the candidate-pair → connected-components → keepers
  * dedup flow through the public API on real test data. */
object DedupDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val keyed = docs.select(col("doc_id"),
      md5(array_join(slice(split(col("text"), " "), 1, 3), " ")).as("k"))
    val edges = keyed.toDF("a", "k").join(keyed.toDF("b", "k"), Seq("k"))
      .filter(col("a") < col("b")).select("a", "b")
    println("edges: " + edges.count())
    val verdicts = graft.operators.ConnectedComponents.keepers(edges)
    verdicts.orderBy("keeper", "node").show(10, false)
    println("clusters: " + verdicts.filter(col("is_keeper")).count()
      + ", members: " + verdicts.count())
    val (f, t) = graft.pipeline.Ingest.rollingWindow(java.time.LocalDate.now())
    println(s"window $f..$t")
    spark.stop()
  }
}
