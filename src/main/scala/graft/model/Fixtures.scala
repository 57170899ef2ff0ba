package graft.model

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic synthetic AQS-shaped fixtures (FIXTURES.md §1-2): a bronze
  * payload with exact-duplicate natural keys, off-list/untrimmed pollutant
  * standards, invalid rows, and NULL metrics — the edge cases the cleaning
  * and dedup operators exist for — plus the census population side table
  * with its echoed header row.
  *
  * Seeded LCG, no external libs: the same (seed, scale) always produces the
  * same rows, so golden tests are stable.
  */
object Fixtures {

  final class Lcg(seed: Long) {
    private var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def int(bound: Int): Int = { val v = (next() >>> 33).toInt % bound; math.abs(v) }
    def double(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble
  }

  private val states = Seq(
    ("01", "Alabama"), ("04", "Arizona"), ("06", "California"),
    ("09", "Connecticut"), ("12", "Florida"), ("17", "Illinois"),
    ("26", "Michigan"), ("36", "New York"), ("48", "Texas"), ("53", "Washington"))

  private val params = Seq(
    ("88101", "PM2.5 - Local Conditions", "Micrograms/cubic meter (LC)", "PM25 24-hour 2024"),
    ("44201", "Ozone", "Parts per million", "Ozone 8-hour 2015"),
    ("42602", "Nitrogen dioxide (NO2)", "Parts per billion", "NO2 1-hour 2010"))

  private val methods = Seq(
    ("118", "R & P Model 2025 PM-2.5 Sequential w/WINS"),
    ("087", "INSTRUMENTAL - ULTRA VIOLET"),
    ("074", "INSTRUMENTAL - CHEMILUMINESCENCE"))

  /** Bronze rows: states × 2 counties × 2 sites × params × `days` days,
    * ~3% exact-duplicate keys with differing non-key values, ~5% invalid or
    * NULL-metric rows, ~4% off-standard or untrimmed standards. */
  def bronze(spark: SparkSession, days: Int = 45, seed: Long = 42L,
             startDate: LocalDate = LocalDate.of(2023, 11, 20)): DataFrame = {
    val rng = new Lcg(seed)
    val rows = Seq.newBuilder[Row]
    for {
      (sc, sname) <- states
      county <- Seq("001", "003")
      site <- Seq("0010", "0021")
      ((pc, pname, unit, std), mIdx) <- params.zipWithIndex
      d <- 0 until days
    } {
      val date = Date.valueOf(startDate.plusDays(d.toLong))
      val poc = 1 + rng.int(2)
      val aqiBase = rng.int(320)
      // pin category boundaries into the data deterministically
      val aqi: Integer = d match {
        case 0 => 50
        case 1 => 100
        case 2 => 150
        case 3 => 200
        case 4 => 300
        case _ if rng.int(30) == 0 => null
        case _ => Integer.valueOf(aqiBase)
      }
      val mean = if (rng.int(25) == 0) null else java.lang.Double.valueOf(math.floor(rng.double() * 8000) / 100)
      val validity = if (rng.int(20) == 0) "N" else "Y"
      val standard = rng.int(25) match {
        case 0 => s" $std "            // untrimmed — exercises trim+isin
        case 1 => "Obsolete 1987 std"  // off-list — row must be dropped
        case _ => std
      }
      val (mc, mname) = methods(mIdx)
      val base = Row(
        sc, county, site, pc, poc,
        30.0 + rng.int(20) + rng.double(), -120.0 + rng.int(40) + rng.double(),
        "WGS84", pname, "24 HOUR", standard, date, unit, "None",
        1 + rng.int(24), math.floor(rng.double() * 10000) / 100, validity,
        mean, 90.0 + rng.int(100), rng.int(24), aqi,
        mc, mname, s"Site $site", s"$county Main St", s"City$county",
        s"County$county", sname,
        if (rng.int(15) == 0) null else s"1${sc}20", s"Metro $sname",
        Date.valueOf(startDate.plusDays(days.toLong)))
      rows += base
      if (rng.int(33) == 0) {
        // exact natural-key duplicate with different non-key values
        rows += Row.fromSeq(base.toSeq.updated(17,
          java.lang.Double.valueOf(999.99)).updated(14, Integer.valueOf(1)))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 8), Schemas.aqsDaily)
  }

  /** Population side table incl. the echoed `state = 'NAME'` header row the
    * reference filters out (Population Ingestion notebook-content.py:45). */
  def statePopulation(spark: SparkSession): DataFrame = {
    val rows = Row("NAME", null, "state") +: states.zipWithIndex.map {
      case ((sc, name), i) => Row(name, Integer.valueOf(1000000 + i * 700001), sc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.statePopulation)
  }
}
