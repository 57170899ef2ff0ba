package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass AQI category histogram as a typed `Aggregator` (the SURVEY §7
  * custom-aggregate showcase): counts all six EPA categories + NULL in a
  * single scan with a fixed 7-slot long buffer — versus the
  * groupBy(category) formulation, this needs no shuffle of category
  * strings and yields one row. Partial aggregation (`merge`) keeps it
  * map-side combinable, exactly like the built-in hash aggregates.
  */
object AqiHistogram
    extends Aggregator[java.lang.Integer, Array[Long], Map[String, Long]] {

  val names: Seq[String] = Seq("Good", "Moderate",
    "Unhealthy for Sensitive Groups", "Unhealthy", "Very Unhealthy",
    "Hazardous", "Unknown")

  private def slot(aqi: java.lang.Integer): Int =
    if (aqi == null) 6
    else if (aqi <= 50) 0
    else if (aqi <= 100) 1
    else if (aqi <= 150) 2
    else if (aqi <= 200) 3
    else if (aqi <= 300) 4
    else 5

  override def zero: Array[Long] = new Array[Long](7)
  override def reduce(b: Array[Long], a: java.lang.Integer): Array[Long] = {
    b(slot(a)) += 1; b
  }
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0; while (i < 7) { x(i) += y(i); i += 1 }; x
  }
  override def finish(b: Array[Long]): Map[String, Long] =
    names.zip(b).toMap
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  /** DataFrame-facing column: `df.agg(AqiHistogram.column(col("aqi")))`. */
  def column(aqi: Column): Column = udaf(this, Encoders.INT).apply(aqi)
}
