package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for every left row, attach the single right row with
  * the greatest `rightTime <= leftTime` within the same key (the temporal
  * "most recent fact as of this moment" lookup: latest price before a
  * trade, last profile update before an event, newest order before a
  * click).
  *
  * Spark has no native as-of operator; the naive encodings both fail at
  * scale: a non-equi range join fans out to every earlier right row per
  * left row before a per-group argmax (O(|L|·|R|) within a key), and a
  * correlated per-row probe is a driver-side loop. This is the scale-right
  * encoding: union the two inputs into one keyed timeline, sort each key
  * once, and carry the latest right payload forward with an ignore-nulls
  * running `last` — ONE shuffle on the key, per-key linear work, no pair
  * blow-up. The window frame is running (unbounded preceding → current
  * row), so Spark evaluates it in a single streaming pass per key.
  *
  * Semantics:
  *  - inclusive: a right row AT the left row's time matches (right rows
  *    sort before left rows on equal timestamps);
  *  - left rows with no earlier right row keep NULL payload (left join);
  *  - right must be unique per (key, rightTime) — pre-aggregate ties to
  *    one row (e.g. latest id that day) or the carried row among equals
  *    is unspecified.
  *
  * Skew note (100 TB): a hot key serializes its own timeline (same bound
  * as any per-key window). If one key holds a melting share of both
  * sides, pre-split it by time range and stitch the boundary — not
  * automated here.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through.
    * @param right     reference side: `key`, `rightTime`, payload columns.
    *                  Every payload column is attached to left rows (NULL
    *                  when no right row is at-or-before).
    * @param key       equi-key column present on both sides.
    * @param leftTime  left timestamp/date column (same type as rightTime).
    * @param rightTime right timestamp/date column; consumed, not emitted —
    *                  alias it into the payload to surface the matched
    *                  time. */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    val clash = left.columns.toSeq.intersect(payload)
    require(clash.isEmpty, s"payload columns collide with left: $clash")
    val passThrough = left.columns.filterNot(_ == key).toSeq

    // One unioned timeline per key. Right rows carry payload and tag 0;
    // left rows carry their own columns and tag 1 — on equal times the
    // right row sorts first, making the match inclusive.
    val lSide = left
      .withColumn("__t", col(leftTime)).withColumn("__tag", lit(1))
    val rSide = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__tag")) ++
        passThrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val timeline = lSide.select(
      Seq(col(key), col("__t"), col("__tag")) ++
        passThrough.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .unionByName(rSide)

    val w = Window.partitionBy(key).orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(timeline) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__t", "__tag")
  }
}
