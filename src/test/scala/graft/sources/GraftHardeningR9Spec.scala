package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Round-9 hardening pins (ADVICE r8): field-id projection must never
  * fall back to name matching for id-carrying columns, startingVersion=0
  * must replay the log rather than collide with the initial-snapshot
  * sentinel, CREATE NAMESPACE must be race-free, and the maintenance-SQL
  * identifier splitter must honor backtick quoting. */
class GraftHardeningR9Spec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val fq = s"graft_cat.ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    fq
  }

  private def store(name: String): GraftTable =
    GraftTableStore.tables((Seq("ns"), name))

  test("RENAME a->b then ADD COLUMN a: historical CDC attributes the " +
      "old values to b (by field id) and NULL to the new a — never a " +
      "name-based mis-attribution") {
    val t = freshTable("t_ren_readd")
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .repartition(1).writeTo(t).create()                        // v1
    spark.sql(s"ALTER TABLE $t RENAME COLUMN a TO b")            // v2
    spark.sql(s"ALTER TABLE $t ADD COLUMN a STRING")             // v3
    val ch = spark.table(s"graft_cat.ns.`t_ren_readd$$changes`")
      .filter($"_commit_version" === 1)
      .select("id", "b", "a").as[(Long, String, Option[String])]
      .collect().toSeq.sortBy(_._1)
    assert(ch === Seq((1L, "x", None), (2L, "y", None)),
      "v1's values must surface under b (old field id); the re-added a " +
        "(a NEW id, absent from v1's schema) must read NULL")
  }

  test("startingVersion=0 replays the commit log instead of silently " +
      "delivering the current snapshot") {
    val t = freshTable("t_sv0")
    Seq((1L, "a")).toDF("id", "v").writeTo(t).create()           // v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")                 // v2
    val table = store("t_sv0")
    val stream = new GraftMicroBatchStream(table, table.schema(),
      Array.empty, new CaseInsensitiveStringMap(
        java.util.Map.of("startingVersion", "0")))
    val off = stream.initialOffset().asInstanceOf[GraftStreamOffset]
    assert(off.version === 0,
      "offset must be 0 (replay from commit 1) — -1 is the snapshot " +
        "sentinel and would skip the log entirely")
    // and the replay delivers BOTH commits' appends as log batches
    val parts = stream.planInputPartitions(off,
      GraftStreamOffset(table.currentVersion))
    val rows = parts.flatMap(_.asInstanceOf[GraftInputPartition].rows)
    assert(rows.length === 2, "replay from 0 must deliver commits 1..2")
  }

  test("two concurrent CREATE NAMESPACE calls: exactly one wins") {
    val cat = new GraftCatalog
    cat.initialize("adv_ns_cat", CaseInsensitiveStringMap.empty())
    val ns = Array("r9_race_" + System.nanoTime())
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        gate.await()
        try {
          cat.createNamespace(ns, java.util.Map.of("owner", s"t$i"))
          wins.incrementAndGet()
        } catch {
          case _: org.apache.spark.sql.catalyst.analysis
            .NamespaceAlreadyExistsException => ()
        }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(wins.get() === 1,
      "putIfAbsent must let exactly one declaration through")
    GraftTableStore.namespaces.remove(ns.toSeq)
  }

  test("maintenance SQL resolves backtick-quoted names containing dots") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_cat.ns.`my.dotted`")
    spark.sql("CREATE TABLE graft_cat.ns.`my.dotted` (id BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.`my.dotted` VALUES (1)")
    spark.sql("INSERT INTO graft_cat.ns.`my.dotted` VALUES (2)")
    // a raw dot-split would mis-resolve to (ns.my, dotted) and miss
    val res = GraftMaintenance.sql(spark,
      "OPTIMIZE graft_cat.ns.`my.dotted` TARGET 100 ROWS").collect()
    assert(res.head.getInt(0) === 2 && res.head.getInt(1) === 1,
      "OPTIMIZE must bin-pack the dotted-name table's two files into one")
    // unbalanced backticks delegate to Spark's parser (loud, not claimed)
    assert(GraftSqlParser.parseMaintenance(
      "OPTIMIZE graft_cat.ns.`broken", Some(spark)).isEmpty)
  }
}
