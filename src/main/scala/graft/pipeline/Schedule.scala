package graft.pipeline

import java.time.{DayOfWeek, Duration, Instant, LocalTime, ZoneId, ZonedDateTime}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Trigger + orchestration semantics of the reference's E1 entry point —
  * the pieces that live OUTSIDE the notebooks: the weekly schedule
  * (`Automated Pipeline.DataPipeline/.schedules:8-20` — Thursday 06:00
  * America/Chicago), the activity dependency graph with on-success
  * conditions (`pipeline-content.json:49-56` — Silver_to_Gold depends on
  * Ingestion "Succeeded"; the warehouse ForEach depends on Silver_to_Gold),
  * per-activity timeout (PIPE:27, 12 h) and the ingest retry policy
  * (Batch_ingestion notebook-content.py:119-139 — 4 attempts, exponential
  * 2·2ⁿ s backoff).
  *
  * These are config objects + a deterministic executor, not a daemon: an
  * external scheduler (cron, Airflow, Fabric) calls
  * [[WeeklyTrigger.nextFireAfter]] to plan and [[ActivityGraph.run]] to
  * execute one pipeline run. Everything is injectable (clock, sleeper) so
  * the semantics are unit-testable without wall-clock time.
  */
object Schedule {

  /** Weekly fire-time rule. The reference's concrete instance is
    * `weeklyThursday0600CST`. */
  final case class WeeklyTrigger(dayOfWeek: DayOfWeek, time: LocalTime,
                                 zone: ZoneId) {
    /** Earliest fire time STRICTLY after `now` (so firing at exactly the
      * trigger instant schedules the next week, not an immediate re-run). */
    def nextFireAfter(now: Instant): Instant = {
      val local = ZonedDateTime.ofInstant(now, zone)
      val candidate = local.`with`(TemporalAdjusters.nextOrSame(dayOfWeek))
        .`with`(time)
      val fire =
        if (candidate.toInstant.isAfter(now)) candidate
        else candidate.`with`(TemporalAdjusters.next(dayOfWeek))
      fire.toInstant
    }
  }

  /** The reference's schedule: weekly, Thursday 06:00, America/Chicago
    * (.schedules:12-19 lists "Thursday" / "06:00" / "Central Standard
    * Time"). */
  val weeklyThursday0600CST: WeeklyTrigger = WeeklyTrigger(
    DayOfWeek.THURSDAY, LocalTime.of(6, 0), ZoneId.of("America/Chicago"))

  /** Retry with exponential backoff — the ingest wrapper's semantics
    * (4 attempts, sleep 2·2ⁿ s between them). `sleeper` is injected so
    * tests assert the schedule without sleeping. */
  final case class RetryPolicy(maxAttempts: Int = 4,
                               baseBackoff: Duration = Duration.ofSeconds(2)) {
    def backoffBefore(attempt: Int): Duration = // attempt is 1-based
      baseBackoff.multipliedBy(1L << (attempt - 1))

    def run[T](body: () => T,
               sleeper: Duration => Unit = d => Thread.sleep(d.toMillis)): T = {
      var attempt = 1
      while (true) {
        try return body()
        catch {
          // NonFatal only: an OOM/interrupt must propagate immediately,
          // not be retried with backoff in a broken JVM
          case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
            sleeper(backoffBefore(attempt))
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(error: Throwable) extends Status
  /** Dependency did not succeed — the activity never started (Fabric's
    * on-success dependency condition). */
  case object Skipped extends Status

  /** One pipeline activity: runs only after every `dependsOn` activity
    * SUCCEEDED, retried per `retry`, abandoned past `timeout` (the
    * reference sets 12 h per activity — enforced here as a post-hoc check
    * because a Spark action is not safely interruptible mid-stage). */
  final case class Activity(name: String, dependsOn: Seq[String] = Nil,
                            retry: RetryPolicy = RetryPolicy(maxAttempts = 1),
                            timeout: Duration = Duration.ofHours(12))(
      val body: () => Unit)

  /** Deterministic topological executor for an activity graph. Returns
    * per-activity terminal status; downstream of a failure is Skipped,
    * independent branches still run (Fabric semantics: each activity
    * waits on ITS dependencies only). Throws on unknown dependencies or
    * cycles — a malformed pipeline definition is a build error, not a
    * runtime surprise. */
  final case class ActivityGraph(activities: Seq[Activity]) {
    private val byName = activities.map(a => a.name -> a).toMap
    require(byName.size == activities.size, "duplicate activity names")
    activities.foreach(a => a.dependsOn.foreach(d =>
      require(byName.contains(d), s"${a.name} depends on unknown activity $d")))

    /** Kahn topological order; throws IllegalArgumentException on cycles. */
    def topoOrder: Seq[Activity] = {
      val indeg = scala.collection.mutable.Map(
        activities.map(a => a.name -> a.dependsOn.size): _*)
      val out = activities.flatMap(a => a.dependsOn.map(_ -> a.name))
        .groupMap(_._1)(_._2)
      val queue = scala.collection.mutable.Queue(
        activities.filter(a => indeg(a.name) == 0).map(_.name): _*)
      val order = scala.collection.mutable.ArrayBuffer.empty[String]
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        order += n
        out.getOrElse(n, Nil).foreach { m =>
          indeg(m) -= 1
          if (indeg(m) == 0) queue += m
        }
      }
      require(order.size == activities.size,
        s"activity graph has a cycle among ${indeg.filter(_._2 > 0).keys}")
      order.map(byName).toSeq
    }

    def run(sleeper: Duration => Unit = d => Thread.sleep(d.toMillis),
            clock: () => Instant = () => Instant.now()): Map[String, Status] = {
      val status = scala.collection.mutable.Map.empty[String, Status]
      topoOrder.foreach { a =>
        if (!a.dependsOn.forall(d => status(d) == Succeeded))
          status(a.name) = Skipped
        else {
          val started = clock()
          try {
            a.retry.run(() => a.body(), sleeper)
            val elapsed = Duration.between(started, clock())
            status(a.name) =
              if (elapsed.compareTo(a.timeout) > 0)
                Failed(new java.util.concurrent.TimeoutException(
                  s"${a.name} exceeded ${a.timeout} (took $elapsed)"))
              else Succeeded
          } catch {
            case scala.util.control.NonFatal(e) => status(a.name) = Failed(e)
          }
        }
      }
      status.toMap
    }
  }

  /** Per-table warehouse copy activity — the ForEach item surface of the
    * reference's Gold→Warehouse stage (`pipeline-content.json:121-126`):
    * `tableOption: autoCreate` (create the sink if absent; with it OFF a
    * missing sink is an error, not a silent create) and `preCopyScript`
    * TRUNCATE (empty the sink before loading — with it OFF rows append).
    * Executed against the session catalog through the same stage+swap /
    * insert paths the S10/S12 rows prove. */
  final case class CopyActivity(source: () => DataFrame, sinkTable: String,
                                autoCreate: Boolean = true,
                                preCopyTruncate: Boolean = true)

  /** Run copy activities in order; returns rows copied per sink. */
  def runCopies(spark: SparkSession, copies: Seq[CopyActivity]): Map[String, Long] =
    copies.map { c =>
      val df = c.source()
      val exists = spark.catalog.tableExists(c.sinkTable)
      if (!exists && !c.autoCreate)
        throw new IllegalStateException(
          s"sink table ${c.sinkTable} does not exist and autoCreate is off")
      if (c.preCopyTruncate || !exists)
        // TRUNCATE + INSERT ≡ atomic overwrite (SURVEY §2.1 S12)
        Catalog.overwriteTable(spark, df, c.sinkTable)
      else
        Catalog.overwriteTable(spark,
          spark.table(c.sinkTable).unionByName(df), c.sinkTable)
      c.sinkTable -> spark.table(c.sinkTable).count()
    }.toMap
}
