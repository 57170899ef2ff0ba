package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Hash bucketing (`PARTITIONED BY (bucket(n, col))`): writes cluster by
  * the catalog's own `bucket` V2 function (one file per bucket), scans
  * report the bucket-transform key grouping, and two co-bucketed tables
  * join storage-partitioned — NO shuffle on either side even though
  * neither is value-partitioned (the Iceberg bucketed fact-fact join;
  * at 100 TB, co-location without enumerable partition values). */
class GraftBucketSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val fq = s"graft_cat.ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    fq
  }

  private def store(name: String): GraftTable =
    GraftTableStore.tables((Seq("ns"), name))

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => walk(q.plan)
    case _ => p +: p.children.flatMap(walk)
  }

  private def executedFinal(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan
  }

  test("bucketed writes land one file per bucket via the catalog bucket " +
      "function; reads are exact") {
    val t = freshTable("t_bkt_w")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.range(0, 400).selectExpr("id AS k", "concat('v', id) AS v")
      .repartition(16) // deliberately scattered: the write must re-cluster
      .writeTo(t).append()
    val table = store("t_bkt_w")
    assert(table.dataFiles.length === 8,
      s"one file per bucket, got ${table.dataFiles.map(_.rowCount)}")
    // every file is uniformly one bucket, and the bucket matches the
    // shared kernel
    table.dataFiles.foreach { f =>
      val gk = f.groupKey.get.head.asInstanceOf[Int]
      f.rows.foreach { r =>
        assert(GraftFunctionsV2.bucketOf(8, r.get(0,
          org.apache.spark.sql.types.LongType)) === gk)
      }
    }
    assert(spark.table(t).count() === 400)
    assert(spark.table(t).filter($"k" === 123L).select("v")
      .as[String].head() === "v123")
  }

  test("co-bucketed tables storage-partition join: no shuffle on either " +
      "side") {
    val ta = freshTable("t_bkt_a")
    val tb = freshTable("t_bkt_b")
    spark.sql(s"CREATE TABLE $ta (k BIGINT, a BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $tb (k BIGINT, b STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.range(0, 400).selectExpr("id AS k", "id * 2 AS a")
      .writeTo(ta).append()
    spark.range(0, 80).selectExpr("id AS k", "concat('b', id) AS b")
      .writeTo(tb).append()

    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = spark.table(ta).join(spark.table(tb), "k")
      assert(joined.count() === 80)
      val plan = executedFinal(joined)
      val shuffles = walk(plan).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"co-bucketed catalog tables must storage-partition join:\n$plan")
      assert(walk(plan).exists(_.isInstanceOf[SortMergeJoinExec]),
        s"expected a shuffle-free sort-merge join:\n$plan")
      // content: every key matches its own row
      val got = joined.selectExpr("k", "a", "b").orderBy("k")
        .as[(Long, Long, String)].collect()
      assert(got.length === 80)
      assert(got.forall { case (k, a, b) => a == 2 * k && b == s"b$k" })
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketing boundaries: no value-partition ops, no identity mix, " +
      "type checks, truncate still works") {
    val t = freshTable("t_bkt_edge")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()

    // dynamic-partition overwrite would silently drop unrelated rows
    // sharing a bucket — rejected loudly
    val ex = intercept[Exception] {
      spark.sql("SET spark.sql.sources.partitionOverwriteMode=dynamic")
      try Seq((1L, "A")).toDF("k", "v")
        .writeTo(t).overwritePartitions()
      finally spark.sql("SET spark.sql.sources.partitionOverwriteMode=static")
    }
    assert(ex.getMessage.contains("bucket") ||
      ex.getCause != null && ex.getCause.getMessage.contains("bucket"),
      s"unexpected: $ex")

    // truncate (full overwrite) remains available
    Seq((5L, "z")).toDF("k", "v").writeTo(t).overwrite(
      org.apache.spark.sql.functions.lit(true))
    assert(spark.table(t).as[(Long, String)].collect().toSeq
      === Seq((5L, "z")))

    // identity + bucket on one table is rejected; bad bucket types too
    intercept[Exception](spark.sql(
      "CREATE TABLE graft_cat.ns.t_bkt_mix (k BIGINT, p INT) " +
        "PARTITIONED BY (p, bucket(4, k))"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graft_cat.ns.t_bkt_badtype (k DOUBLE) " +
        "PARTITIONED BY (bucket(4, k))"))
  }
}
