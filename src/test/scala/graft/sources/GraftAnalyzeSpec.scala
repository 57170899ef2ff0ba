package graft.sources

import graft.SparkSpec

/** ANALYZE TABLE … COMPUTE STATISTICS: one distributed aggregation pass
  * (HLL ndv + null counts + string lengths), persisted in the commit
  * log, served to Catalyst's CBO through the scan's columnStats(). */
class GraftAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE computes ndv/nulls/lengths, feeds CBO attributeStats, " +
      "and survives restart; REPLACE clears the stale stats") {
    val wh = tmpDir("graft-anl")
    spark.conf.set("spark.sql.catalog.anl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.anl.warehouse", wh)
    spark.sql("CREATE TABLE anl.ns.t (id BIGINT, grp STRING, note STRING)")
    (0 until 400).map(i =>
        (i.toLong, s"g${i % 7}", if (i % 5 == 0) null else s"note-$i"))
      .toDF("id", "grp", "note").writeTo("anl.ns.t").append()

    val out = GraftMaintenance.sql(spark,
      "ANALYZE TABLE anl.ns.t COMPUTE STATISTICS FOR ALL COLUMNS")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("grp")._2 === 7L, s"grp ndv: ${out("grp")}")
    assert(out("note")._3 === 80L, s"note nulls: ${out("note")}")
    assert(math.abs(out("id")._2 - 400L) <= 20L, s"id ndv: ${out("id")}")
    assert(out("note")._5 >= 8L, "note max_len covers 'note-399'")

    // CBO reads them: the optimized plan's attributeStats carries the
    // per-column distinct counts the estimator uses
    val saved = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("anl.ns.t")
        .queryExecution.optimizedPlan.stats
      assert(stats.attributeStats.nonEmpty,
        "DSv2 columnStats must reach the catalyst plan stats")
      val grpStat = stats.attributeStats.find(_._1.name == "grp").map(_._2)
      assert(grpStat.exists(_.distinctCount.contains(BigInt(7))),
        s"grp stat: $grpStat")
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)

    // restart: the stats rode the log
    spark.conf.set("spark.sql.catalog.anr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.anr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.anr.warehouse.isolated", "true")
    val rt = spark.sessionState.catalogManager.catalog("anr")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
    assert(rt.columnStatsSnapshot.get("grp").map(_(0)) === Some(7L))

    // FOR COLUMNS merges: re-analyzing one column keeps the others
    GraftMaintenance.sql(spark,
      "ANALYZE TABLE anl.ns.t COMPUTE STATISTICS FOR COLUMNS id").collect()
    val t = spark.sessionState.catalogManager.catalog("anl")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
    assert(t.columnStatsSnapshot.contains("grp") &&
      t.columnStatsSnapshot.contains("id"))

    // REPLACE: the successor's columns share nothing with the stats —
    // they clear rather than mis-describe
    spark.sql("CREATE OR REPLACE TABLE anl.ns.t AS SELECT 1 AS x")
    assert(t.columnStatsSnapshot.isEmpty ||
      spark.sessionState.catalogManager.catalog("anl")
        .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
        .columnStatsSnapshot.isEmpty)

    // unknown column refuses
    val e = intercept[Exception](GraftMaintenance.sql(spark,
      "ANALYZE TABLE anl.ns.t COMPUTE STATISTICS FOR COLUMNS nope")
      .collect())
    assert(e.getMessage.contains("no such column"), e.getMessage)
  }

  test("equi-height histograms (spark.sql.statistics.histogram.enabled) " +
      "move CBO's range-filter cardinality estimate off the uniform " +
      "interpolation, and survive restart") {
    val wh = tmpDir("graft-anlh")
    spark.conf.set("spark.sql.catalog.anh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.anh.warehouse", wh)
    spark.sql("CREATE TABLE anh.ns.t (id BIGINT, v STRING)")
    // heavily skewed: 990 values in [0, 10), 10 outliers in [991, 1000]
    // — uniform min/max interpolation estimates `id > 500` at ~50% of
    // rows; the histogram knows ~99% of the mass sits below 10
    val rows = (0 until 990).map(i => (i % 10.toLong, s"low$i")) ++
      (0 until 10).map(i => (991L + i, s"hi$i"))
    import spark.implicits._
    rows.toDF("id", "v").writeTo("anh.ns.t").append()

    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    def estimate(tbl: String): BigInt = {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try spark.table(tbl).filter("id > 500")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(sys.error("CBO must produce a row-count estimate"))
      finally spark.conf.set("spark.sql.cbo.enabled", savedCbo)
    }

    // plain ANALYZE (no histogram): ndv-only stats — without min/max
    // the estimator falls back near the default selectivity
    GraftMaintenance.sql(spark,
      "ANALYZE TABLE anh.ns.t COMPUTE STATISTICS FOR COLUMNS id")
      .collect()
    val t = spark.sessionState.catalogManager.catalog("anh")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
    assert(t.columnStatsSnapshot("id").length === 4, "no histogram yet")

    // histogram ANALYZE: the packed stats grow and the estimate drops
    // to the histogram's truth (~1% of rows above 500)
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    try {
      GraftMaintenance.sql(spark,
        "ANALYZE TABLE anh.ns.t COMPUTE STATISTICS FOR COLUMNS id")
        .collect()
    } finally
      spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
    val packed = t.columnStatsSnapshot("id")
    assert(packed.length > 8, s"histogram must pack: len=${packed.length}")
    val est = estimate("anh.ns.t")
    assert(est <= BigInt(100),
      s"histogram must expose the skew: estimated $est of 1000 rows " +
        "above 500 (true count: 10)")
    assert(est >= BigInt(1), s"estimate must stay positive: $est")

    // the histogram rides the log: a cold fold serves the same estimate
    spark.conf.set("spark.sql.catalog.anhr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.anhr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.anhr.warehouse.isolated", "true")
    assert(estimate("anhr.ns.t") === est,
      "the restart fold must serve the identical histogram")
  }

  test("DATE columns histogram in epoch-days — a skewed date range " +
      "filter estimates from the histogram, not uniform interpolation") {
    val wh = tmpDir("graft-anld")
    spark.conf.set("spark.sql.catalog.and", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.and.warehouse", wh)
    spark.sql("CREATE TABLE and.ns.t (d DATE, v BIGINT)")
    // 990 rows in Jan 1995, 10 outliers in 2020: `d > 2000-01-01`
    // interpolates to ~80% of rows without a histogram, is ~1% with one
    spark.sql("INSERT INTO and.ns.t SELECT " +
      "date_add(DATE'1995-01-01', CAST(id % 30 AS INT)), id " +
      "FROM range(990)")
    spark.sql("INSERT INTO and.ns.t SELECT " +
      "date_add(DATE'2020-06-01', CAST(id AS INT)), id FROM range(10)")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    try {
      GraftMaintenance.sql(spark,
        "ANALYZE TABLE and.ns.t COMPUTE STATISTICS FOR COLUMNS d")
        .collect()
    } finally
      spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
    val saved = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val est = spark.table("and.ns.t").filter("d > DATE'2000-01-01'")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(sys.error("CBO must estimate"))
      assert(est <= BigInt(100),
        s"date histogram must expose the skew: $est of 1000 " +
          "(true count: 10)")
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)
  }

  test("colStats survive a CHECKPOINT-anchored cold fold after the " +
      "delta tail below the anchor is retired") {
    val savedK = GraftTable.checkpointInterval
    try {
      GraftTable.checkpointInterval = 3
      val wh = tmpDir("graft-anlc")
      spark.conf.set("spark.sql.catalog.anc", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.anc.warehouse", wh)
      spark.sql("CREATE TABLE anc.ns.t (id BIGINT, g STRING)")
      (0 until 100).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "g")
        .writeTo("anc.ns.t").append()
      GraftMaintenance.sql(spark,
        "ANALYZE TABLE anc.ns.t COMPUTE STATISTICS FOR COLUMNS g")
        .collect()
      // push commits past an anchor, then retire the tail below it
      (0 until 4).foreach { i =>
        spark.sql(s"INSERT INTO anc.ns.t VALUES (${1000 + i}, 'gx')")
      }
      GraftMaintenance.sql(spark, "VACUUM anc.ns.t RETAIN 2 SNAPSHOTS")
        .collect()
      spark.conf.set("spark.sql.catalog.ancr",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.ancr.warehouse", wh)
      spark.conf.set("spark.sql.catalog.ancr.warehouse.isolated", "true")
      val t = spark.sessionState.catalogManager.catalog("ancr")
        .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
      assert(t.columnStatsSnapshot.get("g").map(_(0)) === Some(5L),
        s"stats must fold from the checkpoint: ${t.columnStatsSnapshot}")
    } finally GraftTable.checkpointInterval = savedK
  }
}
