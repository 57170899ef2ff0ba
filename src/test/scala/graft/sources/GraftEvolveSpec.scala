package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-spec EVOLUTION (`ALTER TABLE … SET PARTITIONED BY`,
  * Iceberg's spec evolution): re-partition a table WITHOUT rewriting a
  * byte — pre-evolution files degrade to spanning "legacy remainder"
  * files, new writes cluster under the new spec, OPTIMIZE regroups, and
  * time travel binds the old spec's group keys. */
class GraftEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def graftTable(cat: String, ns: String, t: String): GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog].store.tables((Seq(ns), t))

  private def dataFiles(wh: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val dd = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
      .iterator().asScala.toSeq
      .find(p => java.nio.file.Files.isRegularFile(p.resolve("table.json")))
      .get.resolve("data")
    val s = java.nio.file.Files.list(dd)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
    finally s.close()
  }

  test("SET PARTITIONED BY rewrites nothing: old files degroup, new " +
      "writes group under the new spec, reads stay exact across the mix") {
    val wh = tmpDir("graft-evo")
    spark.conf.set("spark.sql.catalog.evo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.warehouse", wh)
    spark.sql("CREATE TABLE evo.ns.t (region STRING, day STRING, " +
      "v BIGINT) PARTITIONED BY (region)")
    Seq(("east", "d1", 1L), ("east", "d2", 2L), ("west", "d1", 3L),
      ("west", "d2", 4L)).toDF("region", "day", "v")
      .writeTo("evo.ns.t").append()
    val preEvolveFiles = dataFiles(wh)
    val preEvolveCount = spark.table("evo.ns.t").count()

    val r = GraftMaintenance.sql(spark,
      "ALTER TABLE evo.ns.t SET PARTITIONED BY (day)").head()
    assert(r.getInt(0) === 2, "both region-grouped files degroup")
    // METADATA-ONLY: not one data byte moved or was written
    assert(dataFiles(wh) === preEvolveFiles,
      "evolution must not touch a single data file")
    val t = graftTable("evo", "ns", "t")
    assert(t.partitionCols === Seq("day"))
    assert(t.filesSnapshot.forall(_.groupKey.isEmpty),
      "pre-evolution files become spanning legacy remainder files")
    assert(spark.table("evo.ns.t").count() === preEvolveCount)

    // new writes group under the NEW spec
    Seq(("north", "d1", 5L), ("north", "d2", 6L)).toDF(
      "region", "day", "v").writeTo("evo.ns.t").append()
    val grouped = t.filesSnapshot.filter(_.groupKey.nonEmpty)
    assert(grouped.nonEmpty &&
      grouped.forall(f => Seq("d1", "d2").contains(
        f.groupKey.get.head.toString)),
      s"post-evolution files must group by day: " +
        s"${t.filesSnapshot.map(_.groupKey)}")

    // reads across the legacy/new mix stay exact; zone skipping is
    // grouping-independent and keeps pruning
    assert(spark.table("evo.ns.t").filter(col("day") === "d1")
      .orderBy("v").as[(String, String, Long)].collect().toSeq ===
      Seq(("east", "d1", 1L), ("west", "d1", 3L), ("north", "d1", 5L)))
    val census = t.lastScanCensus.get
    assert(census.filesRead < census.filesTotal,
      s"zone maps must keep skipping across the mix: $census")

    // metadata/partition DELETE on the NEW spec: legacy spanning files
    // split executor-side, new-grouped files drop by reference
    spark.sql("DELETE FROM evo.ns.t WHERE day = 'd2'")
    assert(spark.table("evo.ns.t").orderBy("v")
      .as[(String, String, Long)].collect().toSeq ===
      Seq(("east", "d1", 1L), ("west", "d1", 3L), ("north", "d1", 5L)))

    // OPTIMIZE regroups the legacy remainder under the new spec — the
    // Iceberg "rewrite to migrate" path for free
    GraftMaintenance.sql(spark, "OPTIMIZE evo.ns.t").collect()
    assert(t.filesSnapshot.forall(_.groupKey.nonEmpty),
      s"OPTIMIZE must regroup legacy files: " +
        s"${t.filesSnapshot.map(_.groupKey)}")
    assert(spark.table("evo.ns.t").count() === 3L)
  }

  test("time travel below the evolution binds the OLD spec; restart " +
      "folds the evolved layout; a foreign process meets the swap " +
      "with the re-open contract") {
    val wh = tmpDir("graft-evor")
    spark.conf.set("spark.sql.catalog.evr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evr.warehouse", wh)
    spark.sql("CREATE TABLE evr.ns.t (region STRING, day STRING, " +
      "v BIGINT) PARTITIONED BY (region)")
    Seq(("east", "d1", 1L), ("west", "d1", 2L)).toDF("region", "day", "v")
      .writeTo("evr.ns.t").append()
    // an isolated second catalog holds a PRE-evolution handle
    spark.conf.set("spark.sql.catalog.evrf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evrf.warehouse", wh)
    spark.conf.set("spark.sql.catalog.evrf.warehouse.isolated", "true")
    assert(spark.table("evrf.ns.t").count() === 2L)

    GraftMaintenance.sql(spark,
      "ALTER TABLE evr.ns.t SET PARTITIONED BY (day)").collect()
    Seq(("north", "d2", 3L)).toDF("region", "day", "v")
      .writeTo("evr.ns.t").append()

    // time travel to v1 (pre-evolution) binds the OLD layout: the
    // snapshot reports region-partitioning and serves the old rows
    assert(spark.sql("SELECT * FROM evr.ns.t VERSION AS OF 1")
      .count() === 2L)
    val t = graftTable("evr", "ns", "t")
    assert(t.partitionCols === Seq("day"))
    val v1 = spark.sessionState.catalogManager.catalog("evr")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t"), "1")
    assert(v1.partitioning().map(_.toString).toSeq
      .exists(_.contains("region")),
      s"the v1 snapshot must report the OLD spec: " +
        s"${v1.partitioning().toSeq}")

    // the stale foreign handle meets the evolution entry and refuses
    // with the re-open contract instead of writing under the old layout
    val e = intercept[Exception] {
      Seq(("south", "d3", 9L)).toDF("region", "day", "v")
        .writeTo("evrf.ns.t").append()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(m => m.contains("partition spec evolved") &&
      m.contains("re-open")), e.getMessage)

    // restart: a fresh fold binds the evolved layout, serves all rows,
    // and keeps the old layout for time travel
    spark.conf.set("spark.sql.catalog.evrr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evrr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.evrr.warehouse.isolated", "true")
    val rt = graftTable("evrr", "ns", "t")
    assert(rt.partitionCols === Seq("day"))
    assert(spark.table("evrr.ns.t").count() === 3L)
    assert(spark.sql("SELECT * FROM evrr.ns.t VERSION AS OF 1")
      .count() === 2L)
    // the restart census keeps the mixed grouping: legacy files keyless,
    // the post-evolution file day-grouped
    assert(rt.filesSnapshot.count(_.groupKey.isEmpty) === 2)
    assert(rt.filesSnapshot.count(_.groupKey.nonEmpty) === 1)
  }

  test("RESTORE across an evolution degroups the restored census and " +
      "keeps CDC delta-sized; CDF reads straight through the evolution") {
    val wh = tmpDir("graft-evot")
    spark.conf.set("spark.sql.catalog.evt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evt.warehouse", wh)
    spark.sql("CREATE TABLE evt.ns.t (region STRING, day STRING, " +
      "v BIGINT) PARTITIONED BY (region)")
    Seq(("east", "d1", 1L), ("west", "d1", 2L)).toDF("region", "day", "v")
      .writeTo("evt.ns.t").append() // v1
    GraftMaintenance.sql(spark,
      "ALTER TABLE evt.ns.t SET PARTITIONED BY (day)").collect() // v2
    Seq(("north", "d2", 3L)).toDF("region", "day", "v")
      .writeTo("evt.ns.t").append() // v3

    // CDF across the evolution: schema/field ids unchanged — the range
    // read serves (unlike REPLACE); the evolution commit itself
    // contributes nothing
    val feed = spark.table("evt.ns.`t$changes`")
      .filter(col("_commit_version") >= 1)
      .select("v", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(feed === Seq((1L, "insert", 1L), (2L, "insert", 1L),
      (3L, "insert", 3L)), s"got $feed")

    // RESTORE to v1 (below the evolution): the restored census serves
    // under the CURRENT spec as legacy files; CDC records only v3's
    // disappearance, not whole-table churn
    GraftMaintenance.sql(spark,
      "RESTORE TABLE evt.ns.t TO VERSION AS OF 1").collect()
    assert(spark.table("evt.ns.t").orderBy("v")
      .as[(String, String, Long)].collect().toSeq ===
      Seq(("east", "d1", 1L), ("west", "d1", 2L)))
    val t = graftTable("evt", "ns", "t")
    assert(t.partitionCols === Seq("day"), "RESTORE keeps the new spec")
    assert(t.filesSnapshot.forall(_.groupKey.isEmpty))
    val restoreDelta = spark.table("evt.ns.`t$changes`")
      .filter(col("_commit_version") === 4)
      .select("v", "_change_type").as[(Long, String)].collect().toSeq
    assert(restoreDelta === Seq((3L, "delete")),
      s"restore CDC must be the true delta, got $restoreDelta")
    // and a fresh fold agrees end-to-end
    spark.conf.set("spark.sql.catalog.evtr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evtr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.evtr.warehouse.isolated", "true")
    assert(spark.table("evtr.ns.t").count() === 2L)
  }

  test("a streaming tail survives an evolution ACROSS A RESTART: the " +
      "live handle refuses at the swap (re-open), and the restarted " +
      "stream resumes from the same checkpoint exactly once") {
    // unlike REPLACE (disjoint field ids — the stream must die), an
    // evolution changes no schema: the contract is restart-the-stream,
    // same checkpoint — version offsets carry straight across
    val wh = tmpDir("graft-evs")
    spark.conf.set("spark.sql.catalog.evs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evs.warehouse", wh)
    spark.sql("CREATE TABLE evs.ns.t (id BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO evs.ns.t VALUES (1, 'x'), (2, 'y')")
    val out = tmpDir("graft-evs-out")
    val ck = tmpDir("graft-evs-ck")
    def drain(): Unit = {
      val q = spark.readStream.table("evs.ns.t")
        .writeStream.format("parquet")
        .option("checkpointLocation", ck).option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // v1's rows land
    assert(spark.read.parquet(out).count() === 2L)
    GraftMaintenance.sql(spark,
      "ALTER TABLE evs.ns.t SET PARTITIONED BY ()").collect() // v2
    spark.sql("INSERT INTO evs.ns.t VALUES (3, 'z')")          // v3
    // the restarted drain re-resolves the table (the evolved object)
    // and resumes from the checkpoint: v2 delivers nothing, v3's row
    // lands exactly once
    drain()
    import spark.implicits._
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("evolution refusals: unknown column, bucketed table; same spec " +
      "is a no-op commit-free; in-JVM tables evolve too") {
    spark.conf.set("spark.sql.catalog.evj", classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE evj.ns.evj_t (a STRING, b STRING, v BIGINT) " +
      "PARTITIONED BY (a)")
    Seq(("x", "p", 1L), ("y", "q", 2L)).toDF("a", "b", "v")
      .writeTo("evj.ns.evj_t").append()
    intercept[Exception](GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_t SET PARTITIONED BY (nope)").collect())
    val t0 = graftTable("evj", "ns", "evj_t")
    val v0 = t0.currentVersion
    GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_t SET PARTITIONED BY (a)").collect() // same
    assert(graftTable("evj", "ns", "evj_t") eq t0, "same spec: no swap")
    assert(t0.currentVersion === v0, "same spec: no commit")
    // in-JVM evolution: the store mapping swaps, reads stay exact
    GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_t SET PARTITIONED BY (b)").collect()
    val t1 = graftTable("evj", "ns", "evj_t")
    assert(t1.partitionCols === Seq("b"))
    assert(spark.table("evj.ns.evj_t").orderBy("v")
      .as[(String, String, Long)].collect().toSeq ===
      Seq(("x", "p", 1L), ("y", "q", 2L)))
    // bucketed tables refuse
    spark.sql("CREATE TABLE evj.ns.evj_bkt (k BIGINT, v STRING) " +
      "CLUSTERED BY (k) INTO 4 BUCKETS")
    val e = intercept[Exception](GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_bkt SET PARTITIONED BY (v)").collect())
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("bucketed")), e.getMessage)
    // case-variant spelling resolves (Spark's case-insensitive
    // resolution, as the widen/bucket guards already match) and stores
    // the SCHEMA's canonical name — the group-key kernels index fields
    // by exact name, so `B` must land as `b`
    val v1 = graftTable("evj", "ns", "evj_t").currentVersion
    GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_t SET PARTITIONED BY (B)").collect()
    assert(graftTable("evj", "ns", "evj_t").currentVersion === v1,
      "B resolves to the live spec (b): a commit-free no-op")
    GraftMaintenance.sql(spark,
      "ALTER TABLE evj.ns.evj_t SET PARTITIONED BY (A)").collect()
    val t2 = graftTable("evj", "ns", "evj_t")
    assert(t2.partitionCols === Seq("a"),
      "case-variant columns must store the schema's canonical spelling")
    assert(spark.table("evj.ns.evj_t").orderBy("v")
      .as[(String, String, Long)].collect().toSeq ===
      Seq(("x", "p", 1L), ("y", "q", 2L)))
  }

  test("SPJ across an evolution: the mixed layout shuffles (loudly " +
      "expected), and OPTIMIZE's regroup RE-ENGAGES the zero-exchange " +
      "storage-partitioned join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec,
      ShuffleExchangeExec}
    def executedFinal(df: org.apache.spark.sql.DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(walk)
    }
    val wh = tmpDir("graft-evo-spj")
    spark.conf.set("spark.sql.catalog.evp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evp.warehouse", wh)
    // t_a starts UNPARTITIONED (its first write lands keyless), then
    // evolves to k-partitioning; t_b is k-partitioned from birth
    spark.sql("CREATE TABLE evp.ns.t_a (k INT, a BIGINT)")
    spark.sql("CREATE TABLE evp.ns.t_b (k INT, b STRING) " +
      "PARTITIONED BY (k)")
    spark.range(0, 200).selectExpr("CAST(id % 8 AS INT) AS k", "id AS a")
      .writeTo("evp.ns.t_a").append()
    GraftMaintenance.sql(spark,
      "ALTER TABLE evp.ns.t_a SET PARTITIONED BY (k)").collect()
    spark.range(200, 400).selectExpr("CAST(id % 8 AS INT) AS k", "id AS a")
      .writeTo("evp.ns.t_a").append() // new-spec groups beside the remainder
    spark.range(0, 80).selectExpr("CAST(id % 8 AS INT) AS k",
      "concat('b', id) AS b").writeTo("evp.ns.t_b").append()

    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    try {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      def joined = spark.table("evp.ns.t_a")
        .join(spark.table("evp.ns.t_b"), "k")
      // phase 1 — MIXED layout: the legacy remainder file is keyless,
      // so the scan must report UnknownPartitioning and the join
      // SHUFFLES. Correct and Iceberg-identical, but degraded.
      val before = joined
      assert(before.count() === 400L * 80 / 8)
      assert(walk(executedFinal(before))
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        "a mixed post-evolution layout cannot storage-partition join")
      // phase 2 — OPTIMIZE regroups the remainder under the new spec
      // (rewrite-to-migrate); the SAME join now plans zero-exchange
      GraftMaintenance.sql(spark, "OPTIMIZE evp.ns.t_a").collect()
      assert(graftTable("evp", "ns", "t_a").filesSnapshot
        .forall(_.groupKey.isDefined),
        "the regroup must leave no spanning files")
      val after = joined
      assert(after.count() === 400L * 80 / 8)
      val plan = executedFinal(after)
      assert(!walk(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"the regrouped table must re-engage SPJ (zero Exchange):\n$plan")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
