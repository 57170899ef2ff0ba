package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Parquet segment IO for the durable catalog store: writes one
  * [[GraftDataFile]]'s rows to a real parquet file and streams them
  * back, WITHOUT launching a nested Spark job. TABLE DATA writes run
  * executor-side inside writer tasks ([[GraftSegmentDataWriter]] — the
  * 100 TB path); only driver-born metadata-sized row sets (CDC
  * pseudo-files, compaction of already-resident rows) encode on the
  * driver. Uses Spark's
  * own parquet WriteSupport/ReadSupport (the exact record codecs the
  * executor-side parquet source uses), so a segment written here is a
  * PLAIN parquet file any engine can read — the durability contract the
  * reference's Delta tables get from their platform
  * (Notebooks/Batch_Bronze_to_Silver.Notebook/notebook-content.py:200
  * `saveAsTable` persists parquet + log; this is the same layout).
  *
  * Timestamps write as TIMESTAMP_MICROS with CORRECTED rebase on both
  * sides — the proleptic-Gregorian representation Catalyst holds
  * internally, so values round-trip bit-exact. */
private[sources] object GraftSegmentIO {

  /** JVM-global read census: absolute segment path → number of times
    * the parquet file was actually opened, regardless of which object
    * (driver-side lazy handle, executor-side partition reader)
    * triggered the load. Specs prove "untouched data is never read"
    * against this. */
  /** Census maps are spec instrumentation living on the hot paths:
    * BOUNDED so a long-running service never accumulates unbounded
    * path strings — beyond the cap, new paths stop being tracked
    * (existing counters keep updating; specs create few files). */
  private val censusCap = 100000

  private def bump(m: java.util.concurrent.ConcurrentHashMap[
      String, java.lang.Long], key: String): Unit =
    if (m.size < censusCap || m.containsKey(key))
      m.merge(key, 1L, _ + _)

  private val readCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def readsOf(file: java.nio.file.Path): Long =
    Option(readCounts.get(file.toAbsolutePath.normalize.toString))
      .map(_.longValue()).getOrElse(0L)

  /** Reads that ran OUTSIDE a Spark task (driver-side) — specs prove
    * scan paths stream executor-side by pinning this at zero. */
  private val driverReadCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def driverReadsOf(file: java.nio.file.Path): Long =
    Option(driverReadCounts.get(file.toAbsolutePath.normalize.toString))
      .map(_.longValue()).getOrElse(0L)

  /** JVM-global WRITE census, split by where the encode ran: inside a
    * Spark task (executor-side — the 100 TB shape) or not (driver-side).
    * Specs prove "table data never funnels through the driver" against
    * the driver count staying zero. */
  private val taskWriteCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val driverWriteCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def taskWritesOf(file: java.nio.file.Path): Long =
    Option(taskWriteCounts.get(file.toAbsolutePath.normalize.toString))
      .map(_.longValue()).getOrElse(0L)
  def driverWritesOf(file: java.nio.file.Path): Long =
    Option(driverWriteCounts.get(file.toAbsolutePath.normalize.toString))
      .map(_.longValue()).getOrElse(0L)

  /** Column mapping down to the physical files (Delta's column-mapping
    * `name` mode): an id-carrying field writes and reads under the
    * CANONICAL physical name `_gc_<id>` plus a PARQUET field id. The
    * physical namespace is keyed by field id alone, so logical renames
    * never move data and — crucially — a requested id ABSENT from the
    * file can only miss (NULL): Spark's reader falls back to NAME
    * matching for ids it can't find, and under logical names a
    * RENAME a→b + ADD COLUMN a would hand the OLD column's bytes to
    * the new, unrelated `a`. Canonical names make that collision
    * impossible. Id-less fields (internal meta schemas) pass through
    * unchanged. */
  private def withParquetIds(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      FieldIds.idOf(f) match {
        case Some(id) if id >= 0 && id <= Int.MaxValue =>
          f.copy(name = s"_gc_$id",
            metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putLong("parquet.field.id", id).build())
        case _ => f
      }
    })

  private def writeConf(schema: StructType): Configuration = {
    val conf = new Configuration(false)
    // local-filesystem only: segment paths are java.nio paths on the
    // warehouse volume; a cluster deployment swaps in its Hadoop conf
    conf.set("fs.defaultFS", "file:///")
    ParquetWriteSupport.setSchema(withParquetIds(schema), conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    // the schema converter reads these with conf.get(...).toBoolean —
    // no defaults, so every key must be present explicitly
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf
  }

  private def readConf(schema: StructType): Configuration = {
    val conf = new Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      withParquetIds(schema).json)
    conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, "true")
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf
  }

  /** Write `rows` (layout = `schema`) as one parquet file at `file`.
    * Returns the file's size in bytes. Writes to a temp sibling first
    * and renames into place, so a crashed writer never leaves a
    * truncated segment behind a name the log could reference. */
  def write(file: java.nio.file.Path, schema: StructType,
            rows: Array[InternalRow]): Long = {
    val counts = if (org.apache.spark.TaskContext.get() != null)
      taskWriteCounts else driverWriteCounts
    bump(counts, file.toAbsolutePath.normalize.toString)
    java.nio.file.Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    java.nio.file.Files.deleteIfExists(tmp)
    val writer = new ParquetWriter[InternalRow](
      new Path(tmp.toUri),
      new ParquetWriteSupport().asInstanceOf[WriteSupport[InternalRow]],
      CompressionCodecName.SNAPPY,
      ParquetWriter.DEFAULT_BLOCK_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_IS_DICTIONARY_ENABLED,
      false, // validating
      ParquetWriter.DEFAULT_WRITER_VERSION,
      writeConf(schema))
    try rows.foreach(writer.write) finally writer.close()
    java.nio.file.Files.move(tmp, file,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.size(file)
  }

  /** Read a whole segment back as compact UnsafeRows in file order. */
  /** EXISTS_DEFAULT backfill (r19 — `ADD COLUMN ... DEFAULT`): the
    * output projection for reading `file` at `schema`. A requested
    * field carrying an EXISTS_DEFAULT whose field id is ABSENT from
    * the file's FOOTER reads the default constant; a field the file
    * stores reads its bytes (stored NULLs stay NULL). Stateless by
    * design — the footer is the one source of truth that survives
    * checkpoint folds, clones and foreign processes — and the footer
    * probe only runs for schemas that carry a default at all (zero
    * cost on every other table). An unreadable footer degrades to the
    * plain read (NULL padding), never an error here — the row read
    * right after will surface real corruption loudly. */
  private def existsDefaultFill(file: java.nio.file.Path,
      schema: StructType)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
    val base: IndexedSeq[Expression] =
      schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        BoundReference(i, f.dataType, f.nullable): Expression
      }
    val withDefault = schema.fields.zipWithIndex
      .filter(_._1.metadata.contains("EXISTS_DEFAULT"))
    if (withDefault.isEmpty) return base
    // segments are IMMUTABLE once committed (writes land by atomic
    // rename and never mutate in place), so the footer's field-id set
    // memoizes per normalized path: one ParquetFileReader.open per
    // (JVM, file), not one per scan — a cache-miss read of a
    // defaults-carrying table costs a single footer parse ever
    // (r19 ADVICE: the double-open ran per read)
    val key = file.toAbsolutePath.normalize.toString
    val cached = footerIdCache.get(key)
    val fileIds: Set[Long] =
      if (cached != null) cached
      else {
        val ids: Set[Long] =
          try {
            val conf = new Configuration(false)
            conf.set("fs.defaultFS", "file:///")
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new Path(file.toUri), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              import scala.jdk.CollectionConverters._
              r.getFileMetaData.getSchema.getFields.asScala
                .flatMap(t => Option(t.getId).map(_.intValue().toLong))
                .toSet
            } finally r.close()
          } catch {
            case scala.util.control.NonFatal(_) => return base
          }
        footerIdCache.put(key, ids)
        ids
      }
    withDefault.foldLeft(base) { case (acc, (f, i)) =>
      FieldIds.idOf(f) match {
        case Some(id) if !fileIds.contains(id) =>
          // evaluate under the zone CAPTURED at declaration — executor
          // session zones must not skew a timezone-sensitive default
          val tz = GraftTable.defaultTzOf(f)
          val v = defaultLitCache.computeIfAbsent(
            (f.metadata.getString("EXISTS_DEFAULT"), f.dataType, tz),
            { case (sql, dt, z) => GraftTable.evalDefault(sql, dt, z) })
          acc.updated(i, Literal(v, f.dataType))
        case _ => acc
      }
    }
  }

  /** Footer field-id sets per normalized segment path (files are
    * immutable once committed; a replaced path is a NEW path) —
    * footers are tiny, the census is file-count-bounded. */
  private val footerIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[Long]]()

  /** Evaluated EXISTS_DEFAULT literal per (sql, dataType) — the parse
    * + fold runs once per declared default, not once per file read. */
  private val defaultLitCache = new java.util.concurrent.ConcurrentHashMap[
    (String, org.apache.spark.sql.types.DataType, String), Any]()

  def read(file: java.nio.file.Path, schema: StructType)
      : Array[InternalRow] = {
    bump(readCounts, file.toAbsolutePath.normalize.toString)
    if (org.apache.spark.TaskContext.get() == null)
      bump(driverReadCounts, file.toAbsolutePath.normalize.toString)
    if (!java.nio.file.Files.exists(file))
      throw new java.io.FileNotFoundException(
        s"segment $file is gone — VACUUM reclaimed it, or a shallow " +
          "clone's source was vacuumed (clones share segments by " +
          "reference; vacuuming the source invalidates them)")
    val reader = ParquetReader
      .builder[InternalRow](new ParquetReadSupport(), new Path(file.toUri))
      .withConf(readConf(schema))
      .build()
    val out = Array.newBuilder[InternalRow]
    // the materializer reuses its row buffer; project to fresh UnsafeRows
    val toUnsafe = UnsafeProjection.create(existsDefaultFill(file, schema))
    try {
      var r = reader.read()
      while (r != null) {
        out += toUnsafe(r).copy()
        r = reader.read()
      }
    } finally reader.close()
    out.result()
  }
}
