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
    checksText: Map[String, String],
    writeId: String) {
  @transient lazy val schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** One task-written segment, as its commit message reports it: stats
  * and identity only, zero rows. Zone values are catalyst-internal
  * (UTF8String / Decimal / primitives) — all Serializable, so the
  * message crosses a real executor→driver boundary unchanged. */
final case class GraftSegmentMeta(rel: String, rowCount: Int, bytes: Long,
    zones: Array[ColZone], groupKey: Option[Seq[Any]])

/** Commit message of a segment-writing task: file references + stats.
  * `schemaJson` is the layout the segments were written with (the
  * driver rebuilds their [[GraftSegmentHandle]]s against it). */
final case class GraftSegmentsMessage(schemaJson: String,
    segs: Array[GraftSegmentMeta]) extends WriterCommitMessage

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
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val schema = spec.schema
  private val checks = spec.checksText.map { case (n, t) =>
    n -> GraftConstraints.compile(t, schema)
  }
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

  override def write(record: InternalRow): Unit = {
    // row-level (replace-data) writes arrive prefixed with Spark's
    // __row_operation column; keep surviving rows, strip the prefix
    val row: InternalRow =
      if (opPrefixed && record.numFields != schema.length) {
        val op = record.getInt(0)
        if (op == RowDeltaUtils.WRITE_OPERATION ||
            op == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION)
          stripOp(record).copy()
        else return
      } else record.copy()
    validate(row)
    buf += row
  }

  override def commit(): WriterCommitMessage = {
    val groups: Seq[Array[InternalRow]] = keyOfOpt match {
      case None => if (buf.isEmpty) Nil else Seq(buf.toArray)
      case Some(keyOf) =>
        buf.toArray.groupBy(keyOf).toSeq
          .sortBy(_._1.mkString("|")) // deterministic file order
          .map(_._2)
    }
    val metas = groups.zipWithIndex.map { case (rs, n) =>
      // stats ride the SAME kernel as driver-side builds; the heap file
      // object is task-local scaffolding and drops with the task
      val f = GraftDataFile.build(rs, schema, keyOfOpt)
      val rel = s"data/seg-${spec.writeId}-e$epochId-p$partitionId" +
        s"-t$taskId-$n.parquet"
      val abs = java.nio.file.Paths.get(spec.tableDir).resolve(rel)
      val bytes = GraftSegmentIO.write(abs, schema, rs)
      written += abs
      GraftSegmentMeta(rel, rs.length, bytes, f.zones, f.groupKey)
    }
    buf.clear()
    GraftSegmentsMessage(spec.schemaJson, metas.toArray)
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
private[sources] final case class GraftRowsDelivery(rows: Array[InternalRow])
    extends GraftDelivery
private[sources] final case class GraftFilesDelivery(
    files: Vector[GraftDataFile]) extends GraftDelivery

private[sources] object GraftDeliveries {
  def rows(batches: Array[Array[InternalRow]]): Array[GraftDelivery] =
    batches.map(GraftRowsDelivery(_): GraftDelivery)
}
