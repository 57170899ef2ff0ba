package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSpec {

  test("aqsJson reads a payload dump with the fixed schema + partition cols") {
    val dir = tmpDir("aqs-json")
    val rows = Seq(
      """{"state_code":"06","county_code":"001","site_number":"0010","parameter_code":"88101","poc":1,"date_local":"2023-11-21","aqi":42,"validity_indicator":"Y","arithmetic_mean":7.5}""",
      """{"state_code":"36","county_code":"005","site_number":"0021","parameter_code":"44201","poc":2,"date_local":"2023-12-02","aqi":151,"validity_indicator":"Y","arithmetic_mean":0.041}""")
    Files.write(Paths.get(dir, "payload.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    val got = Ingest.aqsJson(spark, dir).orderBy("state_code")
    assert(got.schema("date_local").dataType.typeName === "date")
    assert(got.count() === 2)
    val r = got.head()
    assert(r.getAs[String]("state_code") === "06") // leading zero preserved
    assert(r.getAs[Int]("year") === 2023 && r.getAs[Int]("month") === 11)
  }

  test("csv reads header-promoted, explicitly-typed files") {
    val dir = tmpDir("pop-csv")
    Files.write(Paths.get(dir, "pop.csv"),
      "state,population,state_code\nNAME,,state\nCalifornia,39000000,06\n".getBytes("UTF-8"))
    val raw = Ingest.csv(spark, dir, graft.model.Schemas.statePopulation)
    assert(raw.count() === 2)
    val clean = Ingest.cleanPopulation(raw).collect()
    assert(clean.length === 1)
    assert(clean.head.getAs[String]("state_code") === "06")
    assert(clean.head.getAs[Int]("population") === 39000000)
  }
}
