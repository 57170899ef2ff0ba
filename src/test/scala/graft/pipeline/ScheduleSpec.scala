package graft.pipeline

import java.time.{DayOfWeek, Duration, Instant}

import graft.SparkSpec
import graft.pipeline.Schedule._

/** Trigger arithmetic, retry/backoff schedule, dependency-graph execution
  * semantics, and the per-table warehouse copy surface.
  */
class ScheduleSpec extends SparkSpec {
  import spark.implicits._

  test("weekly Thursday 06:00 CST trigger fires strictly after now") {
    val t = weeklyThursday0600CST
    // Wed 2026-08-12 12:00 UTC (= 07:00 in Chicago, CDT) → Thu 06:00 CDT
    // = 11:00 UTC the next day
    val wed = Instant.parse("2026-08-12T12:00:00Z")
    assert(t.nextFireAfter(wed) === Instant.parse("2026-08-13T11:00:00Z"))
    // exactly at the fire instant → NEXT week, not an immediate re-fire
    val atFire = Instant.parse("2026-08-13T11:00:00Z")
    assert(t.nextFireAfter(atFire) === Instant.parse("2026-08-20T11:00:00Z"))
    // Thursday but after 06:00 local → next week too
    val thuLate = Instant.parse("2026-08-13T23:00:00Z")
    assert(t.nextFireAfter(thuLate) === Instant.parse("2026-08-20T11:00:00Z"))
    // winter instant: Chicago is CST (UTC-6) → fire at 12:00 UTC
    val jan = Instant.parse("2026-01-05T00:00:00Z") // a Monday
    assert(t.nextFireAfter(jan) === Instant.parse("2026-01-08T12:00:00Z"))
  }

  test("retry policy: exponential 2·2ⁿ backoff, success stops retrying") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val policy = RetryPolicy(maxAttempts = 4)
    // fails twice, succeeds third — reference ingest-wrapper shape
    val got = policy.run(
      () => { calls += 1; if (calls < 3) sys.error(s"boom $calls"); 42 },
      d => slept += d.toSeconds)
    assert(got === 42 && calls === 3)
    assert(slept.toSeq === Seq(2L, 4L)) // 2·2⁰, 2·2¹
    // exhausting attempts rethrows the final error
    var always = 0
    val e = intercept[RuntimeException](policy.run(
      () => { always += 1; sys.error("always") }, _ => ()))
    assert(always === 4 && e.getMessage === "always")
  }

  test("activity graph: topo order, skip-downstream-of-failure, independent branches run") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    def act(name: String, deps: Seq[String] = Nil, fail: Boolean = false) =
      Activity(name, deps)(() => {
        ran += name; if (fail) sys.error(s"$name failed")
      })
    // reference shape: ingest → silver_to_gold → warehouse ForEach, plus
    // an independent audit branch
    val report = ActivityGraph(Seq(
      act("warehouse", Seq("silver_to_gold")),
      act("silver_to_gold", Seq("ingest"), fail = true),
      act("ingest"),
      act("audit", Seq("ingest")))).run(sleeper = _ => ())
    assert(report("ingest") === Succeeded)
    assert(report("silver_to_gold").isInstanceOf[Failed])
    assert(report("warehouse") === Skipped) // downstream of the failure
    assert(report("audit") === Succeeded)   // independent branch still ran
    assert(ran.toSeq.startsWith(Seq("ingest"))) // topo order respected
    assert(!ran.contains("warehouse"))
  }

  test("activity graph rejects cycles and unknown dependencies") {
    val noop = () => ()
    intercept[IllegalArgumentException] {
      ActivityGraph(Seq(
        Activity("a", Seq("b"))(noop), Activity("b", Seq("a"))(noop)))
        .topoOrder
    }
    intercept[IllegalArgumentException] {
      ActivityGraph(Seq(Activity("a", Seq("ghost"))(noop)))
    }
  }

  test("activity timeout marks Failed (post-hoc, Spark actions are not interruptible)") {
    var tick = 0L
    val clock = () => { tick += 1; Instant.ofEpochSecond(tick * 7200) } // +2h per call
    val report = ActivityGraph(Seq(
      Activity("slow", Nil, timeout = Duration.ofHours(1))(() => ())))
      .run(sleeper = _ => (), clock = clock)
    assert(report("slow").isInstanceOf[Failed])
  }

  test("copy activities honor autoCreate and preCopyScript TRUNCATE semantics") {
    val dims = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    try {
      // autoCreate on: sink created; TRUNCATE semantics: re-copy replaces
      val r1 = Schedule.runCopies(spark, Seq(
        CopyActivity(() => dims, "cp_dim", autoCreate = true,
          preCopyTruncate = true)))
      assert(r1("cp_dim") === 2L)
      val r2 = Schedule.runCopies(spark, Seq(
        CopyActivity(() => dims, "cp_dim", preCopyTruncate = true)))
      assert(r2("cp_dim") === 2L) // truncated then reloaded, not 4
      // append mode (preCopyTruncate off): rows accumulate
      val r3 = Schedule.runCopies(spark, Seq(
        CopyActivity(() => dims, "cp_dim", preCopyTruncate = false)))
      assert(r3("cp_dim") === 4L)
      // autoCreate off + missing sink = error (Fabric tableOption contract)
      val e = intercept[IllegalStateException] {
        Schedule.runCopies(spark, Seq(
          CopyActivity(() => dims, "cp_missing", autoCreate = false)))
      }
      assert(e.getMessage.contains("cp_missing"))
    } finally {
      for (t <- Seq("cp_dim", "cp_dim__staging"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
