package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** The cross-process commit protocol (round 9, VERDICT task 3): two
  * catalog instances with PRIVATE stores over one warehouse path — the
  * in-JVM simulation of two processes. Commits land by hard-link CAS on
  * the log under an OS-file-lock lease; a writer entering a commit
  * replays foreign entries first, so the optimistic conflict checks
  * fire exactly as for in-process concurrency: concurrent appends BOTH
  * land, a COW rewrite racing a foreign append ABORTS
  * (ConcurrentModificationException), and the log CAS itself refuses a
  * duplicate version. */
class GraftCommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  test("concurrent appends from two writer processes both land") {
    val wh = tmpDir("graft-cp-append")
    durableCatalog("cpa", wh)
    spark.sql("CREATE TABLE cpa.ns.t (id BIGINT, v STRING)")
    // second "process": opens AFTER the create, replays the log
    durableCatalog("cpb", wh)

    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(
      ("cpa", 1L to 50L), ("cpb", 51L to 100L)).map { case (cat, ids) =>
      new Thread(() => {
        gate.await()
        try ids.foreach(i =>
          spark.sql(s"INSERT INTO $cat.ns.t VALUES ($i, 'w-$cat')"))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"appends must never conflict: ${errs.peek()}")

    // BOTH processes see ALL 100 rows (each refreshes from the log)
    assert(spark.sql("SELECT count(*) FROM cpa.ns.t")
      .as[Long].head() === 100L)
    assert(spark.sql("SELECT count(*) FROM cpb.ns.t")
      .as[Long].head() === 100L)
    // and a third, fresh process agrees
    durableCatalog("cpc", wh)
    assert(spark.sql("SELECT count(*) FROM cpc.ns.t")
      .as[Long].head() === 100L)
  }

  test("a COW rewrite racing a foreign append aborts instead of " +
      "discarding the append") {
    val wh = tmpDir("graft-cp-cow")
    durableCatalog("cpx", wh)
    spark.sql("CREATE TABLE cpx.ns.c (id BIGINT, v STRING)")
    spark.sql("INSERT INTO cpx.ns.c VALUES (1, 'a')")
    durableCatalog("cpy", wh)

    // writer X's PRIVATE table object (isolated stores don't register
    // in the shared lookup — that is the point)
    val tx = spark.sessionState.catalogManager.catalog("cpx")
      .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), "c"))
    // writer X scans (captures its snapshot base)...
    val base = tx.dataFiles
    // ...writer Y commits an append in between...
    spark.sql("INSERT INTO cpy.ns.c VALUES (2, 'b')")
    // ...writer X's whole-table COW commit must now ABORT: committing
    // the rewrite would silently discard Y's row
    val batch: Array[Array[InternalRow]] = Array(Array(
      new GenericInternalRow(Array[Any](1L,
        org.apache.spark.unsafe.types.UTF8String.fromString("A")))))
    intercept[java.util.ConcurrentModificationException](
      tx.installReplaceGroups(batch, None, "UPDATE", expectedBase = base))
    // Y's append survived, X's rewrite did not land
    assert(spark.sql("SELECT id FROM cpx.ns.c ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))

    // retried against the fresh snapshot, the rewrite goes through
    val base2 = tx.dataFiles
    intercept[Exception] { // sanity: base2 != base
      assert(base2.length === base.length)
    }
    tx.installReplaceGroups(batch, None, "UPDATE", expectedBase = base2)
    assert(spark.sql("SELECT v FROM cpy.ns.c ORDER BY id")
      .as[String].collect().toSeq === Seq("A"))
  }

  // the protocol primitives behind the GraftLogStore seam, exercised
  // against BOTH backends: the local-FS hard-link/file-lock impl and
  // the in-memory conditional-put fake (the object-store shape — no
  // hard links, no OS locks). Identical behavior pins that the commit
  // protocol uses nothing a real object store lacks.
  private val backends: Seq[(String, () => GraftLogStore)] = Seq(
    ("local-fs", () => GraftLogStore.LocalFs),
    ("conditional-put", () => new GraftLogStore.InMemoryCas))

  for ((name, mk) <- backends) {
    test(s"[$name] the log CAS refuses a duplicate commit version") {
      val dir = java.nio.file.Paths.get(tmpDir(s"graft-cp-cas-$name"))
      val log = new GraftTableLog(dir.resolve("t"), mk())
      log.init()
      assert(log.writeEntry(7, """{"x":1}"""))
      assert(!log.writeEntry(7, """{"x":2}"""),
        "the second writer of one version must lose the CAS")
      assert(log.readEntriesFrom(0) === Seq((7, """{"x":1}""")))
    }

    test(s"[$name] racing writers of one version: exactly one CAS wins") {
      val dir = java.nio.file.Paths.get(tmpDir(s"graft-cp-race-$name"))
      val log = new GraftTableLog(dir.resolve("t"), mk())
      log.init()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val ts = (1 to 8).map { i =>
        new Thread(() => {
          gate.await()
          if (log.writeEntry(3, s"""{"w":$i}""")) wins.incrementAndGet()
        })
      }
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      assert(wins.get() === 1, "exactly one writer owns a version")
      assert(log.listEntryVersions === Seq(3))
    }

    test(s"[$name] the commit lease is mutually exclusive and " +
        "reentrant per thread") {
      val dir = java.nio.file.Paths.get(tmpDir(s"graft-cp-lease-$name"))
      val log = new GraftTableLog(dir.resolve("t"), mk())
      log.init()
      var inside = 0
      var maxInside = 0
      val gate = new java.util.concurrent.CountDownLatch(1)
      val ts = (1 to 4).map { _ =>
        new Thread(() => {
          gate.await()
          log.withCommitLock {
            log.withCommitLock { // reentrant: must not deadlock
              inside += 1
              maxInside = math.max(maxInside, inside)
              Thread.sleep(5)
              inside -= 1
            }
          }
        })
      }
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      assert(maxInside === 1, "the lease must serialize writers")
    }
  }
}
