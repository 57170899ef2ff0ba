package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.RowDeltaUtils
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, StructType}

/** Executor-side write path for DURABLE tables: each writer task writes
  * its own parquet segment file(s) straight into the warehouse and its
  * commit message carries ONLY metadata — (relative path, row count,
  * byte size, zone maps, partition-group key). The driver's commit
  * adopts the file references and writes a log entry; table DATA never
  * funnels through the driver, so a table write is bounded by task
  * partition size, not driver heap — the Delta/Iceberg executor-write
  * contract (the reference's Delta writes are executor-side the same
  * way: Notebooks/Batch_Bronze_to_Silver.Notebook/notebook-content.py:200
  * `saveAsTable`).
  *
  * Crash/abort safety: segment names are unique per (write, epoch,
  * partition, task), [[GraftSegmentIO.write]] lands them by atomic
  * rename, and a task abort deletes its own files. A driver crash after
  * tasks committed leaves at worst UNREFERENCED segments (never a log
  * entry pointing at missing data); the retention reclaim sweeps those.
  */

/** Serializable recipe a durable table hands its writer factories: where
  * segments land and everything the task needs to reproduce the
  * driver-side write semantics (group split, zone maps, CHECK
  * validation) without the table object. */
final case class GraftDurableWriteSpec(
    tableDir: String,
    schemaJson: String,
    partitionCols: Seq[String],
    bucketSpec: Option[(Int, String)],
    // COMPILED checks, not text: compiling needs a SQL parser, and a
    // real executor JVM has no SparkSession — the bound expression
    // trees (BoundReference/Literal/arithmetic) are plain serializable
    // Catalyst nodes and evaluate session-free
    checks: Seq[(String, GraftConstraints.Check)],
    writeId: String,
    // fingerprint of the constraint set this write validates against;
    // the commit compares it with the table's CURRENT set and aborts on
    // drift (a concurrent ADD CONSTRAINT between write start and commit
    // must not let unvalidated rows slip in)
    checksFingerprint: String,
    // ROW TRACKING on: writers capture each written row's preserved
    // (_row_id, _row_commit_version) — from the trailing metadata
    // columns of a COW replace-data row, or via [[GraftTrackSink]] for
    // MOR update postimages — and report them per segment; unseen rows
    // report the Mint sentinel and the commit mints fresh ids
    rowTracking: Boolean = false) {
  @transient lazy val schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** One task-written segment, as its commit message reports it: stats
  * and identity only, zero rows. Zone values are catalyst-internal
  * (UTF8String / Decimal / primitives) — all Serializable, so the
  * message crosses a real executor→driver boundary unchanged. */
final case class GraftSegmentMeta(rel: String, rowCount: Int, bytes: Long,
    zones: Array[ColZone], groupKey: Option[Seq[Any]],
    // bloom REFS only — the filter words were written to the segment's
    // sidecar by this task (GraftBloomSidecar); shipping them here would
    // make the commit message O(rows), not O(stats)
    bloomRefs: Array[GraftBloomRef] = null,
    // ROW TRACKING (rewrite writes only): the preserved per-row id /
    // commit-version vectors, Mint-sentinel where the commit must mint.
    // CHURN-sized (8 B per REWRITTEN row — appends ship null and get
    // arithmetic ids), riding the message the way position-view "sel"
    // arrays ride the log; a cluster deployment would instead reserve
    // id blocks per task (the identity-column reservation pattern,
    // installIdentityReserved) and write the sidecar task-side
    trackIds: Array[Long] = null,
    trackVers: Array[Long] = null,
    // the task already wrote the output's .rowids sidecar (all ids
    // preserved — no driver minting needed): attach a lazy-loading
    // explicit track, ship nothing row-sized
    trackSidecar: Boolean = false)

/** Commit message of a segment-writing task: file references + stats.
  * `schemaJson` is the layout the segments were written with (the
  * driver rebuilds their [[GraftSegmentHandle]]s against it);
  * `checksFingerprint` names the constraint set the rows were validated
  * against (the commit aborts if the table's set drifted). */
final case class GraftSegmentsMessage(schemaJson: String,
    segs: Array[GraftSegmentMeta],
    checksFingerprint: String = "") extends WriterCommitMessage

/** The partition-group key kernel, shared by the driver (buildFiles,
  * group predicates) and the executor-side writer — ONE implementation,
  * so a task-written file's group key can never disagree with the
  * catalog's. */
private[sources] object GraftGroupKeys {
  def keyOf(schema: StructType, partitionCols: Seq[String],
            bucketSpec: Option[(Int, String)])
      : Option[InternalRow => Seq[Any]] =
    bucketSpec match {
      case Some((n, c)) =>
        val i = schema.fieldIndex(c)
        val dt = schema.fields(i).dataType
        Some(r => Seq(GraftFunctionsV2.bucketOf(n,
          if (r.isNullAt(i)) null else r.get(i, dt))))
      case None if partitionCols.nonEmpty =>
        val ords = partitionCols.map(schema.fieldIndex)
        val dts = ords.map(schema.fields(_).dataType)
        Some(r => ords.lazyZip(dts).map((i, dt) => r.get(i, dt)))
      case None => None
    }
}

/** Capture channel for ROW-TRACKING writers: a delta (MOR) write calls
  * [[noteTrack]] with the original row's identity immediately before
  * handing an update POSTIMAGE to `write()` — the postimage keeps the
  * preimage's `_row_id` (Delta's row-tracking update semantics). Rows
  * written without a note default to the Mint sentinel. */
private[sources] trait GraftTrackSink {
  def noteTrack(id: Long, ver: Long): Unit
}

/** ROW-TRACKING view of a group-based (ReplaceData) write row. With
  * requiredMetadataAttributes set, Spark 4 routes the rewrite through
  * DataAndMetadataWritingSparkTask: the writer receives
  * `write(metadataRow, dataRow)` — projection views over one
  * underlying row — and marks EVERY carried row WRITE_WITH_METADATA
  * (original metadata rides along for updated rows too), so the plan
  * offers no copied-vs-updated signal. The engine's `_row_probe`
  * metadata column closes the gap: the SCAN serves a canonical hash of
  * each row's data columns, the writer re-hashes what it is about to
  * write, and a mismatch proves the row's value changed — preserve the
  * id, take the committing version (exactly Delta's row-tracking
  * update semantics, decided executor-side at O(1) per row). A write
  * that re-asserts the existing value hashes equal and counts as a
  * copy — the same no-op-update collapse the change feed's multiset
  * cancellation applies. */
private[sources] object GraftReplaceDataOps {
  /** Canonical data-row hash — ONE implementation for the scan's
    * `_row_probe` and the writer's recompute, so the two can never
    * drift: an UnsafeProjection materialization's byte hash. */
  def probeOf(proj: UnsafeProjection, row: InternalRow): Long =
    proj(row).hashCode().toLong

  /** The (id, ver) capture of one replace-data row: id preserved from
    * the metadata view [_row_id, _row_commit_version, _row_probe]
    * (Mint when the row has no source — a merge insert); version
    * preserved only when the written data hashes equal to the probe. */
  def captureOf(meta: InternalRow, record: InternalRow,
      proj: UnsafeProjection): (Long, Long) = {
    if (meta == null || meta.numFields < 3 || meta.isNullAt(0))
      return (GraftRowTrack.Mint, GraftRowTrack.Mint)
    val id = meta.getLong(0)
    val ver = meta.getLong(1)
    val probe = meta.getLong(2)
    val verOut =
      if (!meta.isNullAt(2) && probeOf(proj, record) == probe &&
          !meta.isNullAt(1)) ver
      else GraftRowTrack.Mint
    (id, verOut)
  }
}

/** The executor-side writer itself. Buffers this TASK's rows (bounded
  * by the task's input split — `maxPartitionBytes`-sized, the same
  * bound a real parquet writer's row-group buffer has), then at commit
  * splits them per partition group, computes zone maps through the
  * column-major stats kernel, writes one parquet segment per group, and
  * reports metadata. CHECK constraints validate PER ROW as they arrive
  * (fail fast: a violating row aborts the task before any segment
  * lands, and abort removes partials). */
private[sources] final class GraftSegmentDataWriter(
    spec: GraftDurableWriteSpec, opPrefixed: Boolean,
    partitionId: Int, taskId: Long, epochId: Long,
    fill: Option[GraftFillSpec] = None)
    extends DataWriter[InternalRow] with GraftTrackSink {
  private var filled = 0L
  // row-tracking capture: one (id, ver) per buffered row, Mint default
  private val trackBuf =
    if (spec.rowTracking) scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    else null
  private var pendingTrack: (Long, Long) = null
  override def noteTrack(id: Long, ver: Long): Unit =
    pendingTrack = (id, ver)

  private val schema = spec.schema
  private val checks = spec.checks
  private val keyOfOpt =
    GraftGroupKeys.keyOf(schema, spec.partitionCols, spec.bucketSpec)
  private lazy val stripOp = UnsafeProjection.create(
    schema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i + 1, f.dataType, f.nullable)
    }.toIndexedSeq)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
  private val written =
    scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  private def validate(r: InternalRow): Unit =
    checks.foreach { case (cname, chk) =>
      if (chk.violates(r))
        throw new IllegalStateException(
          s"CHECK constraint '$cname' (${chk.text}) violated by an " +
            "incoming row — commit refused")
    }

  private lazy val probeProj = UnsafeProjection.create(
    schema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }.toIndexedSeq)

  override def write(meta: InternalRow, record: InternalRow): Unit = {
    // group-based rewrite with metadata (row tracking): capture the
    // row's identity from the metadata view, then write the data row
    if (trackBuf != null) pendingTrack =
      GraftReplaceDataOps.captureOf(meta, record, probeProj)
    write(record)
  }

  override def write(record: InternalRow): Unit = {
    // row-level (replace-data) writes arrive prefixed with Spark's
    // __row_operation column; keep surviving rows, strip the prefix
    val stripped: InternalRow =
      if (opPrefixed && record.numFields != schema.length) {
        val op = record.getInt(0)
        if (op == RowDeltaUtils.WRITE_OPERATION ||
            op == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION)
          stripOp(record).copy()
        else return
      } else record
    // identity/generated fill, task-side, BEFORE validation — a CHECK
    // over a generated column sees the generated value. Row-level
    // rewrites fill too (rowLevel mode): carried identity values pass,
    // merge-inserted ones mint, generated columns recompute
    val row: InternalRow = fill match {
      case Some(fs) =>
        // copy BEFORE filling: fill's materialized row holds value
        // references (UTF8String/arrays) into the input buffer, which
        // Spark reuses across write() calls — filling the live record
        // would let later rows overwrite earlier buffered rows' values
        val base = if (stripped eq record) record.copy() else stripped
        val out = fs.fill(base, partitionId, filled)
        filled += 1
        out
      case None => if (stripped eq record) record.copy() else stripped
    }
    validate(row)
    buf += row
    if (trackBuf != null) {
      trackBuf += (if (pendingTrack != null) pendingTrack
        else (GraftRowTrack.Mint, GraftRowTrack.Mint))
      pendingTrack = null
    }
  }

  override def commit(): WriterCommitMessage = {
    // group-split INDICES so the row-tracking capture splits with its
    // rows (a partitioned COW rewrite routes each row's identity to
    // the segment that row lands in)
    val idxAll = buf.indices.toArray
    val groups: Seq[Array[Int]] = keyOfOpt match {
      case None => if (buf.isEmpty) Nil else Seq(idxAll)
      case Some(keyOf) =>
        idxAll.groupBy(i => keyOf(buf(i))).toSeq
          .sortBy(_._1.mkString("|")) // deterministic file order
          .map(_._2)
    }
    val metas = groups.zipWithIndex.map { case (idx, n) =>
      val rs = idx.map(buf(_))
      // stats ride the SAME kernel as driver-side builds; the heap file
      // object is task-local scaffolding and drops with the task
      val f = GraftDataFile.build(rs, schema, keyOfOpt)
      val rel = s"data/seg-${spec.writeId}-e$epochId-p$partitionId" +
        s"-t$taskId-$n.parquet"
      val abs = java.nio.file.Paths.get(spec.tableDir).resolve(rel)
      val bytes = GraftSegmentIO.write(abs, schema, rs)
      written += abs
      // filter words land task-side beside the segment; only the refs
      // ride the commit message
      val refs = GraftBloomSidecar.write(abs, f.blooms)
      if (refs != null) written += GraftBloomSidecar.pathFor(abs)
      // tracking capture: ship only when some row PRESERVES an id —
      // an all-Mint segment (plain append) takes arithmetic assignment
      val (tIds, tVers) =
        if (trackBuf == null ||
            idx.forall(i => trackBuf(i)._1 == GraftRowTrack.Mint))
          (null, null)
        else (idx.map(i => trackBuf(i)._1), idx.map(i => trackBuf(i)._2))
      GraftSegmentMeta(rel, rs.length, bytes, f.zones, f.groupKey, refs,
        trackIds = tIds, trackVers = tVers)
    }
    buf.clear()
    if (trackBuf != null) trackBuf.clear()
    GraftSegmentsMessage(spec.schemaJson, metas.toArray,
      spec.checksFingerprint)
  }

  override def abort(): Unit = {
    written.foreach(java.nio.file.Files.deleteIfExists)
    written.clear()
    buf.clear()
  }

  override def close(): Unit = ()
}

/** What a commit message unpacks to on the driver: either the task's
  * rows (in-JVM tables — the test fast-path) or ready-made file
  * references the task already persisted (durable tables). */
private[sources] sealed trait GraftDelivery
private[sources] final case class GraftRowsDelivery(rows: Array[InternalRow],
    // ROW TRACKING capture aligned with `rows` (null = all-mint)
    trackIds: Array[Long] = null,
    trackVers: Array[Long] = null)
    extends GraftDelivery
private[sources] final case class GraftFilesDelivery(
    files: Vector[GraftDataFile]) extends GraftDelivery

private[sources] object GraftDeliveries {
  def rows(batches: Array[Array[InternalRow]]): Array[GraftDelivery] =
    batches.map(GraftRowsDelivery(_): GraftDelivery)
}

/** The Morton-curve key kernel (`OPTIMIZE ZORDER BY`): 16-bin
  * order-preserving quantization per clustering column from the
  * SCOPE's min/max, bits interleaved. ONE implementation shared by the
  * driver-side compaction (in-JVM tables) and the executor-side
  * compaction tasks (durable tables), so both layouts are
  * bit-identical. Strings quantize by their first 7 bytes big-endian —
  * the order the zone maps' UTF8String min/max compare by. */
private[sources] object GraftZCurve {
  import org.apache.spark.sql.types._

  /** Ordinals of `cols` in `schema`, validated curve-eligible. */
  def checkCols(schema: StructType, cols: Seq[String]): Seq[Int] =
    cols.map { c =>
      val i = schema.fieldIndex(c)
      schema.fields(i).dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | TimestampNTZType | StringType => i
        case dt => throw new IllegalArgumentException(
          s"ZORDER BY $c: unsupported type $dt (integral or string)")
      }
    }

  /** Curve key over `rows` (the clustering scope — a partition group,
    * or the whole table). Nulls take bin 0. */
  def keyFn(schema: StructType, cols: Seq[String],
            rows: Array[InternalRow]): InternalRow => Long = {
    val ords = checkCols(schema, cols)
    val dts = ords.map(schema.fields(_).dataType)
    def longOf(r: InternalRow, j: Int): Option[Long] =
      Option(r.get(ords(j), dts(j))).map {
        case b: java.lang.Byte => b.toLong
        case s: java.lang.Short => s.toLong
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l.longValue()
        case u: org.apache.spark.unsafe.types.UTF8String =>
          val bytes = u.getBytes
          var acc = 0L
          var k = 0
          while (k < 7) {
            acc = (acc << 8) | (if (k < bytes.length) bytes(k) & 0xffL else 0L)
            k += 1
          }
          acc
      }
    // per-column [min, max] over this scope's NON-NULL values
    val mins = Array.fill(cols.length)(Long.MaxValue)
    val maxs = Array.fill(cols.length)(Long.MinValue)
    rows.foreach { r =>
      var j = 0
      while (j < cols.length) {
        longOf(r, j).foreach { v =>
          if (v < mins(j)) mins(j) = v
          if (v > maxs(j)) maxs(j) = v
        }
        j += 1
      }
    }
    // bin width: (range/16)+1 — order-preserving integer quantization;
    // a degenerate column collapses to one bin (only coarsens the curve)
    val steps = Array.tabulate(cols.length) { j =>
      val range = maxs(j) - mins(j)
      if (maxs(j) < mins(j) || range < 0) 0L else range / 16 + 1
    }
    r => {
      var code = 0L
      var j = 0
      while (j < cols.length) {
        val bin = if (steps(j) <= 0) 0L else longOf(r, j) match {
          case Some(v) => math.min(15L, (v - mins(j)) / steps(j))
          case None => 0L
        }
        var b = 0
        while (b < 4) {
          code |= ((bin >> b) & 1L) << (b * cols.length + j)
          b += 1
        }
        j += 1
      }
      code
    }
  }
}

/** One executor-side compaction job: read the listed segments in order,
  * drop dead (delete-vector) positions, optionally z-order the scope,
  * chunk, write merged segment(s) into the warehouse, report metas.
  * Everything is serializable DATA — the task never sees the table. */
private[sources] final case class GraftCompactJob(
    segs: Seq[(String, String, Array[Int])], // (absPath, schemaJson, dead)
    outDir: String, writeId: String, binId: Int,
    schemaJson: String,
    partitionCols: Seq[String], bucketSpec: Option[(Int, String)],
    zorderCols: Seq[String], targetRows: Int,
    // non-empty = schema-evolution REBUILD: keep exactly these input
    // ordinals per row (DROP COLUMN's positional projection), preserve
    // row order/count (delete vectors re-key by position), and emit
    // exactly ONE segment (1:1 file pairing)
    rewriteProject: Array[Int] = Array.emptyIntArray,
    // ROW TRACKING, aligned with `segs`: (tracked, explicit, base,
    // ver) per input — the task computes each OUTPUT row's preserved
    // identity (loading explicit inputs' .rowids sidecars locally) and
    // writes each output segment's sidecar in the task; only when some
    // input is UNTRACKED (pre-enablement) do Mint sentinels force the
    // vectors through the commit message for driver minting
    segTracks: Seq[(Boolean, Boolean, Long, Long)] = Nil)

/** Executor-side COW split of ONE group-spanning file: read the
  * segment, apply the delete vector, route each live row's group key
  * through the partition predicate, and write the touched rows (the
  * CDC preimage, `gone`) and untouched rows (`stay`) as fresh
  * segments. Degenerate outcomes write NOTHING — an untouched file
  * reports zero gone rows (the driver keeps the original by
  * reference), a wholly-touched file reports zero stay rows (the
  * driver removes the original by reference). Everything is
  * serializable data; the task never sees the table. */
private[sources] final case class GraftSplitJob(
    seg: (String, String, Array[Int]), // (absPath, schemaJson, dead)
    outDir: String, writeId: String, binId: Int,
    schemaJson: String,
    partitionCols: Seq[String], bucketSpec: Option[(Int, String)],
    touched: Seq[Any] => Boolean,
    // ROW TRACKING of the input file: (tracked, explicit, base, ver) —
    // a split never mints, so both output sides carry fully-preserved
    // vectors in task-written sidecars (only a flag rides the message)
    segTrack: (Boolean, Boolean, Long, Long) = (false, false, -1L, -1L))

private[sources] final case class GraftSplitResult(
    goneRows: Int, stayRows: Int,
    gone: Array[GraftSegmentMeta], stay: Array[GraftSegmentMeta])

private[sources] object GraftSplit {
  def run(job: GraftSplitJob): GraftSplitResult = {
    val schema = DataType.fromJson(job.schemaJson).asInstanceOf[StructType]
    val keyOf =
      GraftGroupKeys.keyOf(schema, job.partitionCols, job.bucketSpec)
    val keyFn = keyOf.getOrElse((_: InternalRow) => Nil: Seq[Any])
    val (p, sj, dead) = job.seg
    val segSchema = DataType.fromJson(sj).asInstanceOf[StructType]
    val path = java.nio.file.Paths.get(p)
    val all = GraftSegmentIO.read(path, segSchema)
    val deadBs =
      if (dead.isEmpty) scala.collection.immutable.BitSet.empty
      else scala.collection.immutable.BitSet.fromSpecific(dead)
    // split INDICES (original positions) so row identity rides with
    // its rows — a split rewrites bytes, never identities
    val liveIdx = (0 until all.length).filterNot(deadBs.contains).toArray
    val (goneIdx, stayIdx) =
      liveIdx.partition(pn => job.touched(keyFn(all(pn))))
    if (goneIdx.isEmpty)
      return GraftSplitResult(0, stayIdx.length, Array.empty, Array.empty)
    if (stayIdx.isEmpty)
      return GraftSplitResult(goneIdx.length, 0, Array.empty, Array.empty)
    val (tracked, explicit, base, ver) = job.segTrack
    lazy val sidecar = GraftRowIdSidecar.read(path)
    def writeSide(idx: Array[Int],
        side: String): Array[GraftSegmentMeta] = {
      val rows = idx.map(all(_))
      val f = GraftDataFile.build(rows, schema, keyOf)
      val rel = s"data/spl-${job.writeId}-b${job.binId}-$side.parquet"
      val abs = java.nio.file.Paths.get(job.outDir).resolve(rel)
      val bytes = GraftSegmentIO.write(abs, schema, rows)
      val refs = GraftBloomSidecar.write(abs, f.blooms)
      if (tracked) {
        val ids = idx.map(pn =>
          if (explicit) sidecar._1(pn) else base + pn)
        val vers = idx.map(pn =>
          if (explicit) sidecar._2(pn) else ver)
        GraftRowIdSidecar.write(abs, ids, vers)
        Array(GraftSegmentMeta(rel, rows.length, bytes, f.zones,
          f.groupKey, refs, trackSidecar = true))
      } else
        Array(GraftSegmentMeta(rel, rows.length, bytes, f.zones,
          f.groupKey, refs))
    }
    GraftSplitResult(goneIdx.length, stayIdx.length,
      writeSide(goneIdx, "g"), writeSide(stayIdx, "s"))
  }
}

/** Runs [[GraftCompactJob]]s inside Spark tasks: the 100 TB OPTIMIZE /
  * ZORDER shape — rebuild cost spreads across the cluster and the
  * driver handles only file references, like Delta's distributed
  * OPTIMIZE. Reuses the stats kernel and the shared z-curve. */
private[sources] object GraftCompaction {
  def run(job: GraftCompactJob): Array[GraftSegmentMeta] = {
    val schema = DataType.fromJson(job.schemaJson).asInstanceOf[StructType]
    val keyOf =
      GraftGroupKeys.keyOf(schema, job.partitionCols, job.bucketSpec)
    val tracking = job.segTracks.nonEmpty
    val idB = Array.newBuilder[Long]
    val verB = Array.newBuilder[Long]
    val raw: Array[InternalRow] = job.segs.iterator.zipWithIndex.flatMap {
      case ((p, sj, dead), segIdx) =>
        val segSchema = DataType.fromJson(sj).asInstanceOf[StructType]
        val path = java.nio.file.Paths.get(p)
        val all = GraftSegmentIO.read(path, segSchema)
        val deadBs =
          if (dead.isEmpty) scala.collection.immutable.BitSet.empty
          else scala.collection.immutable.BitSet.fromSpecific(dead)
        if (tracking) {
          // per-row identity aligned with the LIVE rows, in position
          // order — sidecars load LOCALLY in this task
          val (tracked, explicit, base, ver) = job.segTracks(segIdx)
          lazy val sidecar = GraftRowIdSidecar.read(path)
          var pos = 0
          while (pos < all.length) {
            if (!deadBs.contains(pos)) {
              if (!tracked) {
                idB += GraftRowTrack.Mint; verB += GraftRowTrack.Mint
              } else if (explicit) {
                idB += sidecar._1(pos); verB += sidecar._2(pos)
              } else { idB += base + pos; verB += ver }
            }
            pos += 1
          }
        }
        (if (dead.isEmpty) all
         else GraftDataFile.liveRows(all, deadBs)).iterator
    }.toArray
    val ids: Array[Long] = if (tracking) idB.result() else null
    val vers: Array[Long] = if (tracking) verB.result() else null
    val rows: Array[InternalRow] =
      if (job.rewriteProject.isEmpty) raw
      else {
        val proj = UnsafeProjection.create(
          job.rewriteProject.toIndexedSeq.zipWithIndex.map { case (in, j) =>
            BoundReference(in, schema.fields(j).dataType,
              schema.fields(j).nullable)
          })
        raw.map(r => proj(r).copy(): InternalRow)
      }
    // chunk by INDEX so the identity vectors split with their rows
    val idxAll = rows.indices.toArray
    val chunks: Iterator[Array[Int]] =
      if (job.rewriteProject.nonEmpty) Iterator.single(idxAll) // 1:1
      else {
        // split per CURRENT group key FIRST: compaction is the REGROUP
        // path for legacy spanning files after a partition-spec
        // evolution — a packed file must land inside one group of the
        // live spec (SPJ re-engages only when every chunk is keyed;
        // without the split a mixed remainder would re-merge spanning).
        // Ordinary bins are single-group already — the split is a no-op.
        val groups: Seq[Array[Int]] = keyOf match {
          case Some(k) if rows.nonEmpty =>
            idxAll.groupBy(i => k(rows(i))).toSeq
              .sortBy(_._1.mkString("|")).map(_._2)
          case _ => Seq(idxAll)
        }
        if (job.zorderCols.isEmpty) groups.iterator
        else groups.iterator.flatMap { g =>
          val key = GraftZCurve.keyFn(schema, job.zorderCols,
            g.map(rows(_)))
          g.sortBy(i => key(rows(i))).grouped(job.targetRows)
        }
      }
    val keepEmpty = job.rewriteProject.nonEmpty // 1:1 pairing contract
    chunks.filter(c => keepEmpty || c.nonEmpty).zipWithIndex
      .map { case (idx, n) =>
        val chunk = idx.map(rows(_))
        val f = GraftDataFile.build(chunk, schema, keyOf)
        val rel = s"data/opt-${job.writeId}-b${job.binId}-$n.parquet"
        val abs = java.nio.file.Paths.get(job.outDir).resolve(rel)
        val bytes = GraftSegmentIO.write(abs, schema, chunk)
        val refs = GraftBloomSidecar.write(abs, f.blooms)
        if (!tracking)
          GraftSegmentMeta(rel, chunk.length, bytes, f.zones, f.groupKey,
            refs)
        else {
          val cIds = idx.map(ids(_))
          val cVers = idx.map(vers(_))
          if (cIds.forall(_ != GraftRowTrack.Mint)) {
            // fully-preserved chunk: the sidecar lands task-side and
            // only a FLAG rides the commit message — O(stats), the
            // posture every task write here keeps
            GraftRowIdSidecar.write(abs, cIds, cVers)
            GraftSegmentMeta(rel, chunk.length, bytes, f.zones,
              f.groupKey, refs, trackSidecar = true)
          } else
            // an untracked (pre-enablement) input: its rows need
            // driver-minted ids, so the vectors ride the message and
            // settle() finalizes + writes the sidecar
            GraftSegmentMeta(rel, chunk.length, bytes, f.zones,
              f.groupKey, refs, trackIds = cIds, trackVers = cVers)
        }
      }.toArray
  }
}
