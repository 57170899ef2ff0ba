package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    // key, q_time, px
    (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 40L, 120.0),
    (2L, 50L, 900.0))
    .toDF("k", "q_time", "px")

  test("attaches the greatest right time at-or-before each left row") {
    val trades = Seq((1L, 5L), (1L, 10L), (1L, 25L), (1L, 99L), (2L, 49L))
      .toDF("k", "t_time")
    val got = AsOfJoin(trades, quotes, "k", "t_time", "q_time")
      .orderBy("k", "t_time")
      .select("k", "t_time", "px")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, 5L, null),     // before any quote → no match (left join)
      (1L, 10L, 100.0),   // tie: quote AT the trade time matches (inclusive)
      (1L, 25L, 110.0),   // carry-forward of the latest earlier quote
      (1L, 99L, 120.0),   // far past the last quote still matches it
      (2L, 49L, null)))   // other key: its only quote is later
  }

  test("keys never cross and all left columns pass through") {
    val trades = Seq((1L, 50L, "a"), (2L, 50L, "b"), (3L, 50L, "c"))
      .toDF("k", "t_time", "tag")
    val out = AsOfJoin(trades, quotes, "k", "t_time", "q_time")
    assert(out.columns.toSet === Set("k", "t_time", "tag", "px"))
    val got = out.collect()
      .map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("px"))).toMap
    assert(got === Map("a" -> Some(120.0), // key 1: latest quote ≤ 50
      "b" -> Some(900.0),                  // key 2's own quote, not key 1's
      "c" -> None))                        // key 3 has no quotes at all
  }

  test("rejects payload/left column collisions") {
    val trades = Seq((1L, 5L, 1.0)).toDF("k", "t_time", "px")
    intercept[IllegalArgumentException] {
      AsOfJoin(trades, quotes, "k", "t_time", "q_time")
    }
  }
}
