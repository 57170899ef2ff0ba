package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec

/** Model-based randomized soak of the durable catalog: a seeded random
  * DML/maintenance/restart sequence runs against one durable table
  * while a plain in-memory map plays the same ops; after every step
  * the table must read back exactly the model. This is the test shape
  * that catches format bugs example-based specs miss — an op ORDER the
  * delta encoder mishandles, a DV landing in the same commit as a
  * checkpoint, a VACUUM racing the retention floor — because the
  * sequence space, not the author, picks the interleaving. Seeds are
  * FIXED so a failure replays deterministically; the knobs are forced
  * hostile (checkpoint every 3 commits, multi-part at 2 files, history
  * retention 8) so delta folds, multi-part checkpoints and anchor-gated
  * reclaim all fire constantly instead of at production cadences. */
class GraftRandomSoakSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
  }

  private def tableDir(wh: String): Path =
    Files.list(Paths.get(wh))
      .filter(p => Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()

  private def soak(mode: String, seed: Long, steps: Int): Unit = {
    val savedK = GraftTable.checkpointInterval
    val savedP = GraftTable.checkpointPartFiles
    val savedH = GraftTable.historyRetention
    try {
      GraftTable.checkpointInterval = 3
      GraftTable.checkpointPartFiles = 2
      GraftTable.historyRetention = 8
      val rnd = new scala.util.Random(seed)
      val tag = if (mode == GraftTable.MergeOnRead) "mor" else "cow"
      val wh = tmpDir(s"graft-soak-$tag")
      // ONE acting catalog for every op (cached store: maintenance SQL
      // resolves it); restart steps cold-fold a throwaway ISOLATED
      // catalog for a one-shot parity read — acting through a stale
      // isolated reader after a foreign VACUUM is the documented
      // stale-reader hazard, not what this soak is probing
      val cat = s"soak_$tag"
      durableCatalog(cat, wh, isolated = false)
      spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, v STRING) " +
        s"TBLPROPERTIES ('write.rowlevel.mode'='$mode')")
      val model = scala.collection.mutable.SortedMap.empty[Long, String]
      var nextId = 0L
      var gen = 0

      def check(at: String, via: String = cat): Unit = {
        val got = spark.sql(s"SELECT id, v FROM $via.ns.t ORDER BY id")
          .as[(Long, String)].collect().toSeq
        assert(got === model.toSeq,
          s"[$mode seed=$seed] divergence after $at: " +
            s"table=${got.take(12)}… model=${model.toSeq.take(12)}…")
      }

      for (step <- 1 to steps) {
        val op = rnd.nextInt(100)
        if (op < 35 || model.isEmpty) { // INSERT a small batch
          val n = 1 + rnd.nextInt(4)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            val v = s"v$gen-$id"
            model(id) = v
            s"($id, '$v')"
          }
          spark.sql(s"INSERT INTO $cat.ns.t VALUES ${rows.mkString(", ")}")
        } else if (op < 55) { // UPDATE a random residue class
          gen += 1
          val k = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          spark.sql(s"UPDATE $cat.ns.t SET v = concat('u$gen-', id) " +
            s"WHERE id % $k = $r")
          model.keys.toSeq.filter(_ % k == r)
            .foreach(id => model(id) = s"u$gen-$id")
        } else if (op < 70) { // DELETE a random residue class
          val k = 3 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          spark.sql(s"DELETE FROM $cat.ns.t WHERE id % $k = $r")
          model.keys.toSeq.filter(_ % k == r).foreach(model.remove)
        } else if (op < 78) { // OPTIMIZE: state-preserving rewrite
          GraftMaintenance.sql(spark, s"OPTIMIZE $cat.ns.t").collect()
        } else if (op < 86) { // VACUUM: anchor + reclaim, state intact
          val keep = 2 + rnd.nextInt(4)
          GraftMaintenance.sql(spark,
            s"VACUUM $cat.ns.t RETAIN $keep SNAPSHOTS").collect()
        } else { // RESTART probe: a cold fold must agree RIGHT NOW
          val cold = s"soak_$tag$step"
          durableCatalog(cold, wh, isolated = true)
          check(s"cold fold at step $step", via = cold)
        }
        check(s"step $step (op=$op)")
      }
      // final: maximal reclaim, then a cold fold must still agree and
      // the retained log must be gapless from its anchor
      GraftMaintenance.sql(spark, s"VACUUM $cat.ns.t RETAIN 2 SNAPSHOTS")
        .collect()
      val fin = s"soak_${tag}_final"
      durableCatalog(fin, wh, isolated = true)
      check("final vacuum+restart", via = fin)
      val td = tableDir(wh)
      val logVs = {
        import scala.jdk.CollectionConverters._
        val s = Files.list(td.resolve("log"))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.endsWith(".json") && n.length == 16)
          .map(_.stripSuffix(".json").toInt).toSeq.sorted
        finally s.close()
      }
      assert(logVs === (logVs.head to logVs.last),
        s"[$mode seed=$seed] retained log must be gapless: $logVs")
    } finally {
      GraftTable.checkpointInterval = savedK
      GraftTable.checkpointPartFiles = savedP
      GraftTable.historyRetention = savedH
    }
  }

  test("randomized COW soak: 60 seeded DML/OPTIMIZE/VACUUM/restart " +
      "steps never diverge from the in-memory model") {
    soak("copy-on-write", seed = 0xC0115EEDL, steps = 60)
  }

  test("randomized MOR soak: DV-heavy sequence under constant " +
      "checkpointing and reclaim never diverges from the model") {
    soak("merge-on-read", seed = 0x5EED00B2L, steps = 60)
  }
}
