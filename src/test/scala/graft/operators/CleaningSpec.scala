package graft.operators

import graft.SparkSpec
import graft.model.{Fixtures, Schemas}
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  lazy val bronze = Fixtures.bronze(spark, days = 20).cache()

  test("cleanStandard keeps only the six kept standards, trimmed, and drops the column") {
    val cleaned = Cleaning.cleanStandard(bronze)
    assert(!cleaned.columns.contains("pollutant_standard"))
    // off-list standards are dropped; padded on-list standards survive
    val kept = bronze.filter(
      trim(col("pollutant_standard")).isin(Schemas.keptStandards: _*)).count()
    assert(cleaned.count() === kept)
    assert(kept < bronze.count()) // fixture plants off-list rows
    val padded = bronze.filter(col("pollutant_standard").startsWith(" ")).count()
    assert(padded > 0) // fixture plants untrimmed rows and they are on-list
  }

  test("validityFilter drops N-flag rows and null metrics") {
    val v = Cleaning.validityFilter(bronze)
    assert(v.filter(col("validity_indicator") =!= "Y").count() === 0)
    assert(v.filter(col("arithmetic_mean").isNull || col("aqi").isNull).count() === 0)
    assert(v.count() < bronze.count())
  }

  test("typeConform is idempotent and yields declared types") {
    val once = Cleaning.typeConform(bronze)
    val twice = Cleaning.typeConform(once)
    assert(once.schema === twice.schema)
    assert(once.schema("date_local").dataType.typeName === "date")
    assert(once.schema("aqi").dataType.typeName === "integer")
  }
}
