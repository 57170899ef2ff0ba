package graft.pipeline

import graft.SparkSpec
import graft.model.Fixtures
import org.apache.spark.sql.functions._

/** Golden end-to-end: fixture bronze → silver → gold, schema + referential
  * integrity + incremental-vs-batch equivalence (SURVEY §5 strategy 2/5). */
class PipelineSpec extends SparkSpec {

  lazy val bronze = Fixtures.bronze(spark, days = 30).cache()
  lazy val population = Ingest.cleanPopulation(Fixtures.statePopulation(spark)).cache()
  lazy val gold = Pipeline.batch(bronze, population)

  test("gold fact has the warehouse DDL column set") {
    assert(gold.fact.columns.toSeq === Seq(
      "date_key", "location_key", "parameter_key", "poc", "method_key",
      "arithmetic_mean", "first_max_value", "first_max_hour", "aqi",
      "observation_count", "observation_percent", "aqi_category",
      "exceeds_standard"))
  }

  test("every fact FK resolves and dim keys are dense 1..N") {
    val f = gold.fact.cache()
    assert(f.filter(col("date_key").isNull).count() === 0)
    assert(f.filter(col("location_key").isNull).count() === 0)
    assert(f.filter(col("parameter_key").isNull).count() === 0)
    assert(f.filter(col("method_key").isNull).count() === 0)
    for ((dim, key) <- Seq(
        (gold.dimDate, "date_key"), (gold.dimLocation, "location_key"),
        (gold.dimParameter, "parameter_key"), (gold.dimMethod, "method_key"))) {
      val keys = dim.select(key).collect().map(_.getLong(0)).sorted
      assert(keys.toSeq === (1L to keys.length).toSeq, s"$key not dense")
      // FK containment
      val unresolved = f.join(dim.select(col(key)), Seq(key), "left_anti").count()
      assert(unresolved === 0, s"$key has unresolved fact rows")
    }
  }

  test("measurement natural key is unique after dedup") {
    val m = BronzeToSilver.measurement(bronze)
    assert(m.groupBy(graft.model.Schemas.measurementKey.map(col): _*)
      .count().filter(col("count") > 1).count() === 0)
  }

  test("aqi_category partitions the fact row count") {
    val f = gold.fact
    val total = f.count()
    val byCat = f.groupBy("aqi_category").count()
      .agg(sum("count")).head().getLong(0)
    assert(byCat === total)
  }

  test("incremental (two half-windows) equals one full batch build") {
    val cut = java.sql.Date.valueOf("2023-12-05")
    val first = bronze.filter(col("date_local") < cut)
    val second = bronze.filter(col("date_local") >= cut)
    val base = Pipeline.batch(first, population)
    val inc = Pipeline.incremental(base, second, population)
    val full = Pipeline.batch(bronze, population)
    // same fact cardinality and same measurement-grain content when mapped
    // back to natural keys (surrogate key values may differ by insertion
    // order, so compare on re-joined natural attributes)
    assert(inc.fact.count() === full.fact.count())
    def natural(g: SilverToGold.Gold) =
      g.fact.join(g.dimDate, "date_key")
        .join(g.dimLocation, "location_key")
        .join(g.dimParameter, "parameter_key")
        .select("date", "state_code", "county_code", "site_number",
          "parameter_code", "poc", "aqi", "arithmetic_mean", "aqi_category")
    assert(natural(inc).except(natural(full)).count() === 0)
    assert(natural(full).except(natural(inc)).count() === 0)
  }

  test("incremental re-apply of the same delta is a no-op") {
    val cut = java.sql.Date.valueOf("2023-12-05")
    val first = bronze.filter(col("date_local") < cut)
    val second = bronze.filter(col("date_local") >= cut)
    val base = Pipeline.batch(first, population)
    val once = Pipeline.incremental(base, second, population)
    val twice = Pipeline.incremental(once, second, population)
    assert(twice.fact.count() === once.fact.count())
    assert(twice.dimDate.count() === once.dimDate.count())
  }

  test("ingestion state-coverage gate") {
    Ingest.assertStateCoverage(bronze, 10) // fixture has exactly 10 states
    intercept[IllegalArgumentException] {
      Ingest.assertStateCoverage(bronze, 11)
    }
  }
}
