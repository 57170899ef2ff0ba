package graft.sources

import graft.SparkSpec

/** MERGE with AUTOMATIC SCHEMA EVOLUTION (`MERGE … WITH SCHEMA
  * EVOLUTION`, Delta's `autoMerge`): a source carrying columns the
  * target lacks reconciles instead of dying in the analyzer — the
  * table declares `TableCapability.AUTOMATIC_SCHEMA_EVOLUTION`, Spark's
  * ResolveMergeIntoSchemaEvolution computes the additive source−target
  * TableChanges and routes them through the catalog's alterTable (the
  * existing METADATA-ONLY ADD COLUMN / lossless type WIDEN), then the
  * row-level write proceeds against the reconciled schema. Non-additive
  * drift (a lossy type conflict) dies loudly in the widen rules. The
  * reference's own pipeline needed exactly this for drifting upstream
  * schemas (Automated_Bronze_to_Silver notebook-content.py:184-189
  * reaches for `overwriteSchema`). */
class GraftMergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  private def mergeEvolve(cat: String, t: String, src: String): Unit =
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.ns.$t t USING $src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

  test("COW: a wider MERGE source ADD-COLUMNs the target metadata-only, " +
      "old rows read NULL, CDF delivers through, restart folds it") {
    val wh = tmpDir("graft-mev-cow")
    durableCatalog("mev", wh)
    // partitioned so the COW rewrite scopes to the TOUCHED group — the
    // untouched partition's file must survive the evolution by reference
    spark.sql("CREATE TABLE mev.ns.t (id BIGINT, part INT, v STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO mev.ns.t VALUES (1, 1, 'a'), (2, 2, 'b')")

    val t = spark.sessionState.catalogManager.catalog("mev")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "t"))
    val segsBefore = t.filesSnapshot.map(_.segment.path).toSet

    Seq((2L, 2, "b2", 20.0), (3L, 2, "c", 30.0))
      .toDF("id", "part", "v", "extra")
      .createOrReplaceTempView("mev_src")
    mergeEvolve("mev", "t", "mev_src")

    // reconciled schema + data: the untouched row reads NULL in the
    // new column — exactly the UNION-BY-NAME restatement
    val got = spark.table("mev.ns.t").orderBy("id")
      .select("id", "v", "extra")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got === Seq((1L, "a", None), (2L, "b2", Some(20.0)),
      (3L, "c", Some(30.0))))

    // the ADD COLUMN leg was METADATA-ONLY: partition 1's file (only
    // the untouched row) was not rewritten — its handle re-pointed
    val segsAfter = t.filesSnapshot.map(_.segment.path).toSet
    assert(segsBefore.exists(segsAfter.contains),
      s"evolution must not rewrite untouched files: " +
        s"before=$segsBefore after=$segsAfter")

    // CDF: the merge's commit delivers the new column; the evolution
    // commit itself is schema-only (no row changes)
    val mergeV = t.currentVersion
    val ch = spark.sql("SELECT _change_type, id, extra FROM " +
      s"mev.ns.`t$$changes` WHERE _commit_version = $mergeV " +
      "ORDER BY _change_type, id")
      .as[(String, Long, Option[Double])].collect().toSeq
    // the group-based COW rewrite records delete+insert (this engine's
    // CDC shape for group rewrites); the preimage predates the column
    assert(ch === Seq(("delete", 2L, None), ("insert", 2L, Some(20.0)),
      ("insert", 3L, Some(30.0))), s"cdf: $ch")
    val evoCh = spark.sql("SELECT count(*) FROM mev.ns.`t$changes` " +
      s"WHERE _commit_version = ${mergeV - 1}").as[Long].head()
    assert(evoCh === 0L, "the evolution commit must deliver no rows")

    // cold fold agrees
    durableCatalog("mev2", wh, isolated = true)
    assert(spark.table("mev2.ns.t").orderBy("id")
      .select("id", "v", "extra")
      .as[(Long, String, Option[Double])].collect().toSeq === got)
  }

  test("MOR: the delta (delete-vector) route evolves identically") {
    val wh = tmpDir("graft-mev-mor")
    durableCatalog("mvm", wh)
    spark.sql("CREATE TABLE mvm.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read')")
    spark.sql("INSERT INTO mvm.ns.t VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "b2", 20L), (3L, "c", 30L)).toDF("id", "v", "n")
      .createOrReplaceTempView("mvm_src")
    mergeEvolve("mvm", "t", "mvm_src")
    val got = spark.table("mvm.ns.t").orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got === Seq((1L, "a", None), (2L, "b2", Some(20L)),
      (3L, "c", Some(30L))))
    durableCatalog("mvm2", wh, isolated = true)
    assert(spark.table("mvm2.ns.t").orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq === got)
  }

  test("a source column WIDER than the target's routes through the " +
      "lossless type widening; lossy drift refuses loudly") {
    val wh = tmpDir("graft-mev-widen")
    durableCatalog("mvw", wh)
    spark.sql("CREATE TABLE mvw.ns.t (id BIGINT, v STRING, w INT)")
    spark.sql("INSERT INTO mvw.ns.t VALUES (1, 'a', 7)")
    // INT target, BIGINT source: metadata-only widen, then the write
    Seq((1L, "a1", 4000000000L), (2L, "b", 5L)).toDF("id", "v", "w")
      .createOrReplaceTempView("mvw_src")
    mergeEvolve("mvw", "t", "mvw_src")
    assert(spark.table("mvw.ns.t").schema("w").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.table("mvw.ns.t").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "a1", 4000000000L), (2L, "b", 5L)))

    // BIGINT target, DOUBLE source: LONG→DOUBLE is lossy (>2^53) —
    // the widen rules refuse, the statement dies loudly, nothing lands
    spark.sql("CREATE TABLE mvw.ns.t2 (id BIGINT, w BIGINT)")
    spark.sql("INSERT INTO mvw.ns.t2 VALUES (1, 7)")
    Seq((1L, 1.5), (2L, 2.5)).toDF("id", "w")
      .createOrReplaceTempView("mvw_bad")
    val e = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mvw.ns.t2 t USING mvw_bad s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).nonEmpty, "lossy drift must fail loudly")
    assert(spark.table("mvw.ns.t2").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 7L)), "a refused evolution must leave the table untouched")
  }

  test("WITHOUT the clause a wider source still fails (evolution is " +
      "opt-in per statement, Delta's contract); in-JVM tables evolve too") {
    // in-JVM (no warehouse): the rebuild path serves the same semantics
    spark.conf.set("spark.sql.catalog.mvj", classOf[GraftCatalog].getName)
    spark.sql("CREATE TABLE mvj.ns.mvj_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mvj.ns.mvj_t VALUES (1, 'a')")
    Seq((1L, "a2", 9L), (5L, "e", 55L)).toDF("id", "v", "n")
      .createOrReplaceTempView("mvj_src")
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """MERGE INTO mvj.ns.mvj_t t USING mvj_src s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)
        |""".stripMargin))
    mergeEvolve("mvj", "mvj_t", "mvj_src")
    assert(spark.table("mvj.ns.mvj_t").orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq ===
      Seq((1L, "a2", Some(9L)), (5L, "e", Some(55L))))
  }
}
