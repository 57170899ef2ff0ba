package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec

/** Model-based randomized soak of the durable catalog: a seeded random
  * DML/MERGE/maintenance/evolution/RESTORE/restart sequence runs
  * against one durable table while a plain in-memory map plays the
  * same ops; after every step the table must read back exactly the
  * model. This is the test shape that catches format bugs
  * example-based specs miss — an op ORDER the delta encoder
  * mishandles, a DV landing in the same commit as a checkpoint, a
  * RESTORE folded through a later VACUUM — because the sequence space,
  * not the author, picks the interleaving. Seeds are FIXED so a
  * failure replays deterministically; the knobs are forced hostile
  * (checkpoint every 3 commits, multi-part at 2 files, history
  * retention 8) so delta folds, multi-part checkpoints and
  * anchor-gated reclaim all fire constantly instead of at production
  * cadences. */
class GraftRandomSoakSpec extends SparkSpec {
  import spark.implicits._

  private def durableCatalog(name: String, dir: String,
                             isolated: Boolean,
                             logstore: Option[String] = None): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    if (isolated)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.isolated", "true")
    logstore.foreach(ls =>
      spark.conf.set(s"spark.sql.catalog.$name.warehouse.logstore", ls))
  }

  private def tableDir(wh: String): Path =
    Files.list(Paths.get(wh))
      .filter(p => Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()

  private def soak(mode: String, seed: Long, steps: Int,
                   logstore: Option[String] = None): Unit = {
    val savedK = GraftTable.checkpointInterval
    val savedP = GraftTable.checkpointPartFiles
    val savedH = GraftTable.historyRetention
    try {
      GraftTable.checkpointInterval = 3
      GraftTable.checkpointPartFiles = 2
      GraftTable.historyRetention = 8
      val rnd = new scala.util.Random(seed)
      // row tracking decided off the SEED (not rnd — op sequence
      // unchanged); joins the tag so each soak run gets its OWN
      // catalog name (CatalogManager caches instances per name)
      val tracked = (seed & 1L) == 0L
      val tag = (if (mode == GraftTable.MergeOnRead) "mor" else "cow") +
        (if (logstore.isDefined) "cas" else "") +
        (if (tracked) "rt" else "")
      val wh = tmpDir(s"graft-soak-$tag")
      // ONE acting catalog for every op (cached store: maintenance SQL
      // resolves it); restart steps cold-fold a throwaway ISOLATED
      // catalog for a one-shot parity read — acting through a stale
      // isolated reader after a foreign VACUUM is the documented
      // stale-reader hazard, not what this soak is probing
      // on the conditional-put backend every catalog is isolated (the
      // cached forWarehouse store is LocalFs-only); maintenance SQL
      // still resolves it because catalog-qualified statements scope to
      // the named catalog's own store
      val cat = s"soak_$tag"
      durableCatalog(cat, wh, isolated = logstore.isDefined, logstore)
      // half the soak runs carry AUTO-COMPACTION (r16, async): the
      // background daemon's layout commits interleave the whole
      // hostile cadence — checkpoint folds, VACUUM anchors, RESTORE,
      // cold restarts — and check() drains the daemon first, so every
      // async OPTIMIZE is verified against the model like any other
      // commit
      val autoc = if (rnd.nextBoolean()) ", 'auto.compact'='4'" else ""
      // tracked runs pin the r20 invariant at every check: ids
      // non-null and UNIQUE across the whole hostile cadence — COW
      // rewrites, compaction, RESTORE, spec evolution, checkpoint
      // folds, cold restarts — until a REPLACE swaps the identity away
      val trackp = if (tracked) ", 'row.tracking'='true'" else ""
      spark.sql(s"CREATE TABLE $cat.ns.t_$tag (id BIGINT, v STRING) " +
        s"TBLPROPERTIES ('write.rowlevel.mode'='$mode'$autoc$trackp)")
      // id -> (v, w); w exists only after the one-shot ADD COLUMN
      val model =
        scala.collection.mutable.SortedMap.empty[Long, (String, Option[Long])]
      // id -> _row_id continuity model (tracked runs): cleared at
      // state-rewind ops, asserted unchanged everywhere else
      val idOf = scala.collection.mutable.Map.empty[Long, Long]
      var nextId = 0L
      var gen = 0
      var evolved = false
      // versions below the newest REPLACE swap are not legal RESTORE
      // targets (field ids are disjoint across the swap — the restore
      // refuses by contract, like any cross-schema restore)
      var minRestoreV = 0
      var replaces = 0
      var evolutions = 0
      var specOnV = false
      var widenedW = false
      var widens = 0
      var branchN = 0
      var branchDraws = 0
      // branches left LIVE across later draws: name -> the (id, v)
      // state frozen at the draw — every later vacuum/replace/restart
      // must leave it bit-readable (tree-aware retention's contract)
      val liveBranch =
        scala.collection.mutable.Map.empty[String, Seq[(Long, String)]]
      // tags left live: name -> main's (id, v) state frozen at the
      // draw — the retention PIN must keep it bit-readable through
      // every later vacuum/replace/restore/restart
      val liveTag =
        scala.collection.mutable.Map.empty[String, Seq[(Long, String)]]
      // tags created with a TINY declared age (r18): must be GONE by
      // the end — reads refuse, the refs relation drops the row
      val expiredTag = scala.collection.mutable.ArrayBuffer.empty[String]

      def wLit(id: Long): (String, Option[Long]) =
        if (id % 3 == 0) ("NULL", None) else ((id * 7).toString, Some(id * 7))

      def check(at: String, via: String = cat): Unit = {
        // drain pending auto-compactions so the parity read (and any
        // cold fold the caller just built) sees a settled layout
        assert(GraftAutoCompact.quiesce(),
          s"[$mode seed=$seed] auto-compact queue must drain at $at")
        if (tracked && replaces == 0) {
          if (sys.env.contains("GRAFT_SOAK_RT_DEBUG")) {
            val dump = spark.sql(
              s"SELECT id, _row_id, _row_commit_version " +
                s"FROM $via.ns.t_$tag ORDER BY id").collect()
              .map(r => s"${r.getLong(0)}->${r.getLong(1)}@${r.getLong(2)}")
              .mkString(" ")
            // scalastyle:off println
            println(s"RTSOAK $at: $dump")
          }
          // row identity: non-null and UNIQUE at every settle point
          val (n, nd, nn) = spark.sql(
            s"SELECT count(*), count(DISTINCT _row_id), " +
              s"count(CASE WHEN _row_id IS NULL THEN 1 END) " +
              s"FROM $via.ns.t_$tag").as[(Long, Long, Long)].head()
          assert(nn == 0L,
            s"[$mode seed=$seed] NULL _row_id after $at")
          if (n != nd) {
            val dups = spark.sql(
              s"SELECT _row_id, _row_commit_version, id, v " +
                s"FROM $via.ns.t_$tag WHERE _row_id IN (" +
                s"SELECT _row_id FROM $via.ns.t_$tag " +
                s"GROUP BY _row_id HAVING count(*) > 1) ORDER BY _row_id")
              .collect().toSeq
            fail(s"[$mode seed=$seed] duplicate _row_id after $at " +
              s"($n vs $nd): $dups")
          }
          // STABILITY: a continuously-live row never changes identity.
          // State-REWIND ops (RESTORE, branch squash/publish, staged
          // replace-clone) legitimately rewind identities with the
          // rows, so callers clear the continuity model there.
          val cur = spark.sql(
            s"SELECT id, _row_id FROM $via.ns.t_$tag").collect()
            .map(r => r.getLong(0) -> r.getLong(1))
          idOf.keys.filterNot(model.contains).toSeq.foreach(idOf.remove)
          cur.foreach { case (id, rid) =>
            idOf.get(id) match {
              case Some(prev) =>
                if (prev != rid && sys.env.contains("GRAFT_SOAK_RT_DEBUG")) {
                  val st = spark.sessionState.catalogManager.catalog(via)
                    .asInstanceOf[GraftCatalog].store
                  val tbl = st.tables.getOrElse((Seq("ns"), s"t_$tag"),
                    st.branchTables.collectFirst {
                      case (_, t) => t }.orNull)
                  // scalastyle:off println
                  if (tbl != null) tbl.dataFiles.zipWithIndex.foreach {
                    case (f, i) =>
                      val t = f.track
                      println(s"RTFILE[$i] rows=${f.rowCount} " +
                        s"persisted=${f.persisted} track=" +
                        (if (t == null) "null"
                         else s"(base=${t.base},ver=${t.ver}," +
                           s"explicit=${t.explicit})"))
                  }
                }
                assert(prev == rid,
                  s"[$mode seed=$seed] row $id changed _row_id " +
                    s"$prev -> $rid after $at")
              case None => idOf(id) = rid
            }
          }
        }
        if (evolved) {
          val got = spark.sql(s"SELECT id, v, w FROM $via.ns.t_$tag ORDER BY id")
            .as[(Long, String, Option[Long])].collect().toSeq
          assert(got === model.toSeq.map { case (id, (v, w)) => (id, v, w) },
            s"[$mode seed=$seed] divergence after $at: " +
              s"table=${got.take(12)}… model=${model.toSeq.take(12)}…")
        } else {
          val got = spark.sql(s"SELECT id, v FROM $via.ns.t_$tag ORDER BY id")
            .as[(Long, String)].collect().toSeq
          assert(got === model.toSeq.map { case (id, (v, _)) => (id, v) },
            s"[$mode seed=$seed] divergence after $at: " +
              s"table=${got.take(12)}… model=${model.toSeq.take(12)}…")
        }
      }

      val landing = tmpDir(s"graft-soak-$tag-land")
      for (step <- 1 to steps) {
        val op = rnd.nextInt(100)
        if (op < 20 || model.isEmpty) { // INSERT a small batch
          val n = 1 + rnd.nextInt(4)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            val v = s"v$gen-$id"
            if (evolved) {
              val (lit, w) = wLit(id)
              model(id) = (v, w)
              s"($id, '$v', $lit)"
            } else { model(id) = (v, None); s"($id, '$v')" }
          }
          spark.sql(s"INSERT INTO $cat.ns.t_$tag VALUES ${rows.mkString(", ")}")
        } else if (op < 26) { // COPY INTO (r15): idempotent file ingest
          // a unique landing dir per step; the statement runs TWICE —
          // the per-file ledger marks must make the re-run a no-op
          // whatever checkpoint/reclaim/restart cadence surrounds it
          gen += 1
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1
            (id, s"cp$gen-$id", if (evolved) wLit(id) else ("NULL", None))
          }
          val values = rows.map { case (id, v, (lw, _)) =>
            if (evolved) s"(CAST($id AS BIGINT), '$v', CAST($lw AS INT))"
            else s"(CAST($id AS BIGINT), '$v')"
          }.mkString(", ")
          val colsAs = if (evolved) "x(id, v, w)" else "x(id, v)"
          spark.sql(s"SELECT * FROM VALUES $values AS $colsAs")
            .coalesce(1).write.parquet(s"$landing/step$step")
          GraftMaintenance.sql(spark,
            s"COPY INTO $cat.ns.t_$tag FROM '$landing/step$step'").collect()
          val again = GraftMaintenance.sql(spark,
            s"COPY INTO $cat.ns.t_$tag FROM '$landing/step$step'").head()
          assert(again.getInt(0) === 0,
            s"[$mode seed=$seed] COPY re-run at step $step must skip")
          rows.foreach { case (id, v, (_, w)) => model(id) = (v, w) }
        } else if (op < 42) { // UPDATE a random residue class (v only)
          gen += 1
          val k = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          spark.sql(s"UPDATE $cat.ns.t_$tag SET v = concat('u$gen-', id) " +
            s"WHERE id % $k = $r")
          model.keys.toSeq.filter(_ % k == r)
            .foreach(id => model(id) = (s"u$gen-$id", model(id)._2))
        } else if (op < 50) { // DELETE a random residue class
          val k = 3 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          spark.sql(s"DELETE FROM $cat.ns.t_$tag WHERE id % $k = $r")
          model.keys.toSeq.filter(_ % k == r).foreach(model.remove)
        } else if (op < 56 && step > 6) { // named-branch lifecycle (r17):
          // fork at the head, audit in isolation (insert + delete on
          // the branch chain), then one of: FAST FORWARD the audited
          // commits onto main (model adopts them), DROP the branch
          // (nothing reaches main), or leave it LIVE — a live branch
          // rides every later vacuum/REPLACE/restart draw, which is
          // exactly where a tree-retention bug would eat its segments
          gen += 1; branchN += 1; branchDraws += 1
          val b = s"br$branchN"
          // settle queued main-side auto-compactions first: a daemon
          // commit landing between the fork and the fast-forward would
          // be genuine divergence (the refusal is correct, the soak
          // just doesn't want to draw it)
          assert(GraftAutoCompact.quiesce())
          // r18: a third of the branches declare their OWN snapshot
          // retention — the per-chain window rides the whole cadence
          // (trims its history, never its state; FF still adopts)
          val retainClause =
            if (rnd.nextInt(3) == 0) " RETAIN 2 SNAPSHOTS" else ""
          GraftMaintenance.sql(spark,
            s"ALTER TABLE $cat.ns.t_$tag CREATE BRANCH $b$retainClause")
            .collect()
          val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val values = fresh.map { id =>
            if (evolved) s"($id, 'b$gen-$id', ${wLit(id)._1})"
            else s"($id, 'b$gen-$id')"
          }.mkString(", ")
          spark.sql(s"INSERT INTO $cat.ns.`t_$tag@$b` VALUES $values")
          // settle the BRANCH's own enqueued compact pass before the
          // row-level delete: the pass splicing mid-statement aborts
          // the DELETE with the documented optimistic-retry contract
          // (ForkedWriterMain retries it for real; the seeded soak
          // stays deterministic by draining instead)
          assert(GraftAutoCompact.quiesce())
          val k = 4 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          spark.sql(s"DELETE FROM $cat.ns.`t_$tag@$b` WHERE id % $k = $r")
          assert(GraftAutoCompact.quiesce())
          rnd.nextInt(6) match {
            case 0 => // FAST FORWARD: main replays the audited commits
              val n = GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag FAST FORWARD TO $b")
                .head().getInt(0)
              assert(n >= 1,
                s"[$mode seed=$seed] FF must adopt the audit commits")
              fresh.foreach(id =>
                model(id) = (s"b$gen-$id", if (evolved) wLit(id)._2 else None))
              model.keys.toSeq.filter(_ % k == r).foreach(model.remove)
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b").collect()
            case 1 => // DROP: the audit never reaches main
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b").collect()
            case 2 => // leave LIVE, frozen expectation recorded
              val expect = (model.toSeq.map { case (id, (v, _)) =>
                (id, v)
              } ++ fresh.map(id => (id, s"b$gen-$id")))
                .filterNot(_._1 % k == r).sortBy(_._1)
              liveBranch(b) = expect
            case 4 => // diverge main, then SQUASH-MERGE (r18): main
              // adopts the branch head's net state as one commit — the
              // audited rows land, the branch's deletes apply, and the
              // divergent main row VANISHES (it was never on the branch)
              val divergeId = nextId; nextId += 1
              spark.sql(s"INSERT INTO $cat.ns.t_$tag VALUES " +
                (if (evolved)
                  s"($divergeId, 'd$gen-$divergeId', ${wLit(divergeId)._1})"
                else s"($divergeId, 'd$gen-$divergeId')"))
              assert(GraftAutoCompact.quiesce())
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag MERGE BRANCH $b").collect()
              fresh.foreach(id =>
                model(id) = (s"b$gen-$id", if (evolved) wLit(id)._2 else None))
              model.keys.toSeq.filter(_ % k == r).foreach(model.remove)
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b").collect()
            case 5 => // r19: STACKED branches — fork a SECOND branch
              // from main, audit it, squash it ONTO the first (the
              // branch-target merge; main untouched in between), then
              // squash the first onto main: main adopts the second
              // branch's net state transitively, and the first
              // branch's own audits vanish (squash REPLACES the
              // target's state — exactly the consolidation contract)
              val b2 = s"${b}x"
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag CREATE BRANCH $b2").collect()
              val id2 = nextId; nextId += 1
              spark.sql(s"INSERT INTO $cat.ns.`t_$tag@$b2` VALUES " +
                (if (evolved) s"($id2, 'c$gen-$id2', ${wLit(id2)._1})"
                 else s"($id2, 'c$gen-$id2')"))
              assert(GraftAutoCompact.quiesce())
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.`t_$tag@$b` MERGE BRANCH $b2")
                .collect()
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag MERGE BRANCH $b").collect()
              model(id2) =
                (s"c$gen-$id2", if (evolved) wLit(id2)._2 else None)
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b").collect()
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b2").collect()
            case _ => // drop the branch, TAG main's current state
              // instead: the immutable pin must read back bit-equal
              // after every later vacuum/replace/restore/restart.
              // r18: tags draw an expiry age — a LONG one (the pin
              // must hold exactly as an age-less tag's would) or a
              // TINY one (the tag must expire under the cadence: reads
              // refuse, the refs row disappears, segments release)
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag DROP BRANCH $b").collect()
              val ageClause = rnd.nextInt(3) match {
                case 0 => " RETAIN 9999 HOURS"
                case 1 => " RETAIN 0.000001 HOURS" // 3.6 ms: expires
                case _ => ""
              }
              GraftMaintenance.sql(spark,
                s"ALTER TABLE $cat.ns.t_$tag CREATE TAG tg$branchN" +
                  ageClause).collect()
              if (ageClause.contains("0.000001"))
                expiredTag += s"tg$branchN"
              else liveTag(s"tg$branchN") =
                model.toSeq.map { case (id, (v, _)) => (id, v) }
          }
        } else if (op < 66) { // MERGE: update some, insert some
          gen += 1
          val hit = model.keys.toSeq
            .filter(_ => rnd.nextInt(3) == 0).take(3)
          val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val srcRows = (hit ++ fresh).map { id =>
            if (evolved) s"(CAST($id AS BIGINT), 'm$gen-$id', ${wLit(id)._1})"
            else s"(CAST($id AS BIGINT), 'm$gen-$id')"
          }
          if (evolved) {
            spark.sql(
              s"""MERGE INTO $cat.ns.t_$tag t
                 |USING (SELECT * FROM VALUES ${srcRows.mkString(", ")}
                 |       AS x(id, v, w)) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.v, w = s.w
                 |WHEN NOT MATCHED THEN INSERT (id, v, w)
                 |  VALUES (s.id, s.v, s.w)""".stripMargin)
            (hit ++ fresh).foreach(id =>
              model(id) = (s"m$gen-$id", wLit(id)._2))
          } else {
            spark.sql(
              s"""MERGE INTO $cat.ns.t_$tag t
                 |USING (SELECT * FROM VALUES ${srcRows.mkString(", ")}
                 |       AS x(id, v)) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT (id, v)
                 |  VALUES (s.id, s.v)""".stripMargin)
            (hit ++ fresh).foreach(id => model(id) = (s"m$gen-$id", None))
          }
        } else if (op < 72) { // state-preserving rewrite: OPTIMIZE, or
          // REORG PURGE (r13 — physically drops DV'd rows, MOR's GDPR
          // path; a no-op census on DV-less tables)
          if (rnd.nextInt(3) == 0)
            GraftMaintenance.sql(spark,
              s"REORG TABLE $cat.ns.t_$tag APPLY (PURGE)").collect()
          else
            GraftMaintenance.sql(spark, s"OPTIMIZE $cat.ns.t_$tag").collect()
        } else if (op < 80) { // VACUUM: anchor + reclaim, state intact
          // every other time, first an ANALYZE (r13): its colStats
          // commit rides entries/checkpoints and must survive the
          // vacuum's anchor slide and every later cold fold
          if (rnd.nextInt(2) == 0)
            GraftMaintenance.sql(spark,
              s"ANALYZE TABLE $cat.ns.t_$tag COMPUTE STATISTICS " +
                "FOR COLUMNS v").collect()
          val keep = 2 + rnd.nextInt(4)
          GraftMaintenance.sql(spark,
            s"VACUUM $cat.ns.t_$tag RETAIN $keep SNAPSHOTS").collect()
        } else if (op < 86) { // RESTORE to a random retained version
          val vs = spark.sql(s"SELECT version FROM $cat.ns.`t_$tag$$history`")
            .as[Int].collect().sorted.filter(_ >= minRestoreV)
          if (vs.length > 1) {
            val v = vs(rnd.nextInt(vs.length))
            val old = spark.sql(s"SELECT * FROM $cat.ns.t_$tag VERSION AS OF $v")
            // RESTORE across the ADD COLUMN refuses by contract — only
            // same-schema targets are legal restore points
            if (old.columns.length == (if (evolved) 3 else 2)) {
              val snap =
                if (evolved)
                  old.select("id", "v", "w")
                    .as[(Long, String, Option[Long])].collect()
                    .map { case (id, vv, w) => id -> (vv, w) }
                else
                  old.select("id", "v").as[(Long, String)].collect()
                    .map { case (id, vv) => id -> (vv, None: Option[Long]) }
              GraftMaintenance.sql(spark,
                s"RESTORE TABLE $cat.ns.t_$tag TO VERSION AS OF $v").collect()
              model.clear(); snap.foreach { case (id, r) => model(id) = r }
            }
          }
        } else if (op < 89 && !evolved && step > 8) { // one-shot evolution
          // added NARROW on purpose: a later draw widens it (r14's
          // ALTER COLUMN TYPE) amid the same hostile cadence
          if (rnd.nextBoolean()) {
            spark.sql(s"ALTER TABLE $cat.ns.t_$tag ADD COLUMN w INT")
          } else {
            // r15: the ADD COLUMN arrives through MERGE WITH SCHEMA
            // EVOLUTION — a wider source reconciles the target inside
            // the statement (the evolution commit + the row-level
            // write land back to back amid the hostile cadence)
            gen += 1
            val hit = model.keys.toSeq
              .filter(_ => rnd.nextInt(3) == 0).take(2)
            val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
              val id = nextId; nextId += 1; id
            }
            val srcRows = (hit ++ fresh).map { id =>
              s"(CAST($id AS BIGINT), 'm$gen-$id', " +
                s"CAST(${wLit(id)._1} AS INT))"
            }
            spark.sql(
              s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.ns.t_$tag t
                 |USING (SELECT * FROM VALUES ${srcRows.mkString(", ")}
                 |       AS x(id, v, w)) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
            (hit ++ fresh).foreach(id =>
              model(id) = (s"m$gen-$id", wLit(id)._2))
          }
          evolved = true // existing rows read NULL — model already None
        } else if (op < 89 && evolved && !widenedW && step > 12) {
          // one-shot TYPE WIDENING (r14): INT -> BIGINT metadata-only;
          // the encoder upcasts on read either way, so the model is
          // type-blind — what this probes is the widen entry folding
          // through checkpoints, reclaim and cold restarts. Restores
          // below the widen would cross a schema change (refused by
          // contract), so the restore floor advances.
          spark.sql(s"ALTER TABLE $cat.ns.t_$tag ALTER COLUMN w " +
            "TYPE BIGINT")
          widenedW = true
          minRestoreV = spark.sql(
            s"SELECT max(version) FROM $cat.ns.`t_$tag$$history`")
            .as[Int].head()
          widens += 1
        } else if (op < 92 && step > 4) { // partition-spec EVOLUTION
          // (r14): flip between unpartitioned and v-partitioned amid
          // the hostile checkpoint/reclaim cadence — pre-evolution
          // files degroup to legacy remainders, later OPTIMIZEs
          // regroup, cold folds must bind the evolved layout, and
          // RESTOREs may now cross the spec change
          specOnV = !specOnV
          val spec = if (specOnV) "v" else ""
          GraftMaintenance.sql(spark,
            s"ALTER TABLE $cat.ns.t_$tag SET PARTITIONED BY ($spec)")
            .collect()
          evolutions += 1
        } else if (op < 95 && step > 5) { // atomic staged REPLACE (r13):
          // same logical shape (the model keeps working; RESTORE across
          // the swap is refused — field ids are disjoint), fresh rows.
          // Under the hostile knobs the swap entry lands amid constant
          // checkpointing, retention trims and cold folds — exactly the
          // layout-threading interleavings the example specs can't cover
          gen += 1
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1
            (id, s"r$gen-$id", if (evolved) wLit(id) else ("NULL", None))
          }
          val values = rows.map { case (id, v, (lw, _)) =>
            if (evolved) s"(CAST($id AS BIGINT), '$v', CAST($lw AS BIGINT))"
            else s"(CAST($id AS BIGINT), '$v')"
          }.mkString(", ")
          val colsAs = if (evolved) "x(id, v, w)" else "x(id, v)"
          spark.sql(s"CREATE OR REPLACE TABLE $cat.ns.t_$tag " +
            s"TBLPROPERTIES ('write.rowlevel.mode'='$mode') " +
            s"AS SELECT * FROM VALUES $values AS $colsAs")
          model.clear()
          rows.foreach { case (id, v, (_, w)) => model(id) = (v, w) }
          minRestoreV = spark.sql(
            s"SELECT max(version) FROM $cat.ns.`t_$tag$$history`")
            .as[Int].head()
          replaces += 1
          specOnV = false // CTAS recreates unpartitioned
          widenedW = true // the CTAS types w BIGINT outright
        } else if (op < 97 && step > 6) { // WAP publish (r16): stage =
          // shallow clone, audited writes land in isolation, DEEP
          // publish back (one commit the change feed reads through;
          // the deepen re-points adopted segments so the stage drops) —
          // the whole flow amid the checkpoint/reclaim/restart cadence
          gen += 1
          val stage = s"t_${tag}_wap"
          spark.sql(s"DROP TABLE IF EXISTS $cat.ns.$stage")
          GraftMaintenance.sql(spark,
            s"CREATE TABLE $cat.ns.$stage SHALLOW CLONE $cat.ns.t_$tag")
            .collect()
          val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val values = fresh.map { id =>
            if (evolved) s"($id, 'w$gen-$id', ${wLit(id)._1})"
            else s"($id, 'w$gen-$id')"
          }.mkString(", ")
          spark.sql(s"INSERT INTO $cat.ns.$stage VALUES $values")
          val k = 4 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          spark.sql(s"DELETE FROM $cat.ns.$stage WHERE id % $k = $r")
          GraftMaintenance.sql(spark,
            s"CREATE OR REPLACE TABLE $cat.ns.t_$tag DEEP CLONE " +
              s"$cat.ns.$stage").collect()
          spark.sql(s"DROP TABLE $cat.ns.$stage")
          fresh.foreach(id =>
            model(id) = (s"w$gen-$id", if (evolved) wLit(id)._2 else None))
          model.keys.toSeq.filter(_ % k == r).foreach(model.remove)
        } else { // RESTART probe: a cold fold must agree RIGHT NOW
          val cold = s"soak_$tag$step"
          durableCatalog(cold, wh, isolated = true, logstore)
          check(s"cold fold at step $step", via = cold)
        }
        // ops that legally rewind row identity with the rows clear
        // the continuity model (their uniqueness still asserts)
        if ((op >= 50 && op < 56) || (op >= 80 && op < 97))
          idOf.clear()
        check(s"step $step (op=$op)")
      }
      // final: maximal reclaim, then a cold fold must still agree and
      // the retained log must be gapless from its anchor
      GraftMaintenance.sql(spark, s"VACUUM $cat.ns.t_$tag RETAIN 2 SNAPSHOTS")
        .collect()
      val fin = s"soak_${tag}_final"
      durableCatalog(fin, wh, isolated = true, logstore)
      check("final vacuum+restart", via = fin)
      // every branch left live must still read back its frozen state —
      // through the COLD fold — after all the vacuums, restores and
      // replaces that ran since its draw
      liveBranch.foreach { case (b, expect) =>
        val got = spark.sql(
          s"SELECT id, v FROM $fin.ns.`t_$tag@$b` ORDER BY id")
          .as[(Long, String)].collect().toSeq
        assert(got === expect,
          s"[$mode seed=$seed] live branch $b lost state: " +
            s"got=${got.take(12)}… expect=${expect.take(12)}…")
      }
      // every live TAG must read back its frozen pin through the cold
      // fold — the retention-pin contract under the whole cadence
      liveTag.foreach { case (tg, expect) =>
        val got = spark.sql(
          s"SELECT id, v FROM $fin.ns.`t_$tag@$tg` ORDER BY id")
          .as[(Long, String)].collect().toSeq
        assert(got === expect.sortBy(_._1),
          s"[$mode seed=$seed] tag $tg lost its pinned state: " +
            s"got=${got.take(12)}… expect=${expect.take(12)}…")
      }
      // every tiny-age tag expired under the cadence: its read refuses
      // and its refs row is gone (the final vacuum swept the pin)
      expiredTag.foreach { tg =>
        intercept[Exception](
          spark.sql(s"SELECT * FROM $fin.ns.`t_$tag@$tg`").collect())
      }
      if (expiredTag.nonEmpty) {
        val names = spark.sql(s"SELECT name FROM $fin.ns.`t_$tag$$branches`")
          .as[String].collect().toSet
        assert(expiredTag.forall(!names.contains(_)),
          s"[$mode seed=$seed] expired tags must leave the refs " +
            s"relation: $names vs $expiredTag")
      }
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
      info(s"[$mode seed=${seed.toHexString}] $steps steps, " +
        s"$replaces REPLACE swap(s), $evolutions spec evolution(s), " +
        s"$widens widen(s), $branchDraws branch draw(s) " +
        s"(${liveBranch.size} branch(es), ${liveTag.size} tag(s) left " +
        s"live, ${expiredTag.size} tag(s) expired) exercised")
      assert(evolutions >= 1,
        s"[$mode seed=$seed] the op space must exercise spec evolution")
      assert(branchDraws >= 1,
        s"[$mode seed=$seed] the op space must exercise branches")
    } finally {
      GraftTable.checkpointInterval = savedK
      GraftTable.checkpointPartFiles = savedP
      GraftTable.historyRetention = savedH
    }
  }

  test("randomized COW soak: 60 seeded DML/MERGE/OPTIMIZE/VACUUM/" +
      "RESTORE/evolution/restart steps never diverge from the model") {
    soak("copy-on-write", seed = 0xC0115EEDL, steps = 60)
  }

  test("randomized MOR soak: DV-heavy sequence under constant " +
      "checkpointing and reclaim never diverges from the model") {
    soak("merge-on-read", seed = 0x5EED00B3L, steps = 60)
  }

  test("randomized MOR soak on the conditional-put LogStore: the same " +
      "random op space through the object-store-shaped commit protocol") {
    soak("merge-on-read", seed = 0x5EEDCA5AL, steps = 40,
      logstore = Some("conditional-put"))
  }

  test("randomized COW soak with ROW TRACKING: identity stays non-null " +
      "and unique through the full hostile cadence") {
    soak("copy-on-write", seed = 0xC0115EE2L, steps = 60)
  }
}
