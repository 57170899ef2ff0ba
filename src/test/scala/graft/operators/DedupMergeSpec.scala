package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupMergeSpec extends SparkSpec {
  import spark.implicits._

  lazy val dup = Seq(
    ("k1", 1, "2024-01-02"), ("k1", 2, "2024-01-01"), ("k1", 3, "2024-01-01"),
    ("k2", 4, "2024-01-05")).toDF("k", "v", "d")

  test("deterministic dedup keeps min-by-tiebreak per key") {
    val got = Dedup.deterministic(dup, Seq("k"), Seq("d", "v"))
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSeq
      === Seq(("k1", 2), ("k2", 4)))
  }

  test("arbitrary dedup yields unique keys") {
    val got = Dedup.arbitrary(dup, Seq("k"))
    assert(got.count() === 2)
    assert(got.select("k").distinct().count() === 2)
  }

  test("insert-only merge = target ∪ (source ∖ target); idempotent") {
    val target = Seq((1, "t1"), (2, "t2")).toDF("id", "v")
    val source = Seq((2, "s2"), (3, "s3")).toDF("id", "v")
    val merged = MergeInsertOnly(target, source, Seq("id"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    // matched key 2 keeps the TARGET value (insert-only, no update)
    assert(rows === Seq((1, "t1"), (2, "t2"), (3, "s3")))
    val again = MergeInsertOnly(merged, source, Seq("id"))
    assert(again.count() === merged.count())
    assert(again.except(merged).count() === 0)
  }

  test("full merge apply: insert + update + delete in one pass, idempotent") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val changes = Seq(
      (2, "B", "changed"),   // update
      (3, null, "removed"),  // delete
      (4, "d", "added"))     // insert
      .toDF("id", "v", "change_type")
    val applied = MergeApply(target, changes, Seq("id"))
    val rows = applied.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "a"), (2, "B"), (4, "d")))
    // idempotent for a fixed changelog
    val again = MergeApply(applied, changes, Seq("id"))
    assert(again.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === rows)
    // empty changelog is the identity
    val empty = changes.filter(col("id") < 0)
    assert(MergeApply(target, empty, Seq("id")).except(target).count() === 0)
  }

  test("full merge apply fails on unknown change_type, never silent-deletes") {
    val target = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val typo = Seq((2, "B", "add")).toDF("id", "v", "change_type") // not 'added'
    val e = intercept[Exception] {
      MergeApply(target, typo, Seq("id")).collect()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("unknown change_type"))
  }

  test("merge property: key set of result = keys(target) ∪ keys(source)") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val t = (1 to 30).map(_ => (rng.nextInt(20), rng.nextInt(100))).toDF("id", "v")
        .dropDuplicates("id")
      val s = (1 to 30).map(_ => (rng.nextInt(20), rng.nextInt(100))).toDF("id", "v")
        .dropDuplicates("id")
      val m = MergeInsertOnly(t, s, Seq("id"))
      val expect = (t.select("id").collect().map(_.getInt(0)).toSet
        ++ s.select("id").collect().map(_.getInt(0)).toSet)
      assert(m.select("id").collect().map(_.getInt(0)).toSet === expect)
      assert(m.groupBy("id").count().filter(col("count") > 1).count() === 0)
    }
  }
}
