package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 catalog whose tables support Spark 4's native
  * `MERGE INTO` SQL — the SQL-surface route to the merge semantics the
  * API-side operators ([[graft.operators.MergeApply]],
  * [[graft.operators.MergeInsertOnly]]) prove under oracle. The reference's
  * upsert IS a SQL MERGE (Automated_Silver_to_Gold
  * notebook-content.py:271-349 builds a Delta `MERGE` statement); with this
  * catalog registered (`spark.sql.catalog.<name>=graft.sources.GraftCatalog`)
  * a user can write literal `MERGE INTO <name>.ns.t USING ...` and Spark's
  * analyzer rewrites it through [[GraftTable]]'s row-level-operation
  * support.
  *
  * Execution model: GROUP-BASED copy-on-write — Spark's
  * `RewriteMergeIntoTable` joins the target scan with the source, applies
  * the WHEN clauses, and hands the operation's write the complete
  * post-merge contents of the scanned groups, which commit() swaps in
  * atomically. For an UNPARTITIONED table the whole table is one group
  * (mirroring the reference's non-partitioned gold dims); a table created
  * `PARTITIONED BY` identity columns gets PER-PARTITION groups — the
  * row-level scan supports runtime filtering on the partition columns, so
  * Spark's group-filter subquery narrows the rewrite to the partitions
  * that actually contain matched rows, exactly like Delta/Iceberg's
  * file-level COW. That is the reference's semantics (Delta MERGE is also
  * a COW file rewrite) at both granularities.
  *
  * Storage is an in-JVM row store: this catalog is the SQL-route ADAPTER,
  * sized for the dim/changelog tables MERGE targets in this pipeline —
  * data-plane writes stream through per-task [[DataWriter]]s and only the
  * commit messages carry rows to the driver (the same shape Spark's own
  * in-memory test catalog uses). A production deployment backs the same
  * Table/RowLevelOperation surface with a real file format; the scale path
  * for fact-sized merges remains the operator route, whose plans are
  * oracle- and shape-verified (s11/s19).
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  // typed (namespace, name) keys — a flattened dotted string cannot
  // round-trip nested namespaces or distinguish the default namespace
  private def key(ident: Identifier): (Seq[String], String) =
    (ident.namespace().toSeq, ident.name())

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftTableStore.tables.keys.toArray.collect {
      case (ns, n) if ns == namespace.toSeq => Identifier.of(namespace, n)
    }

  override def loadTable(ident: Identifier): Table =
    GraftTableStore.tables.get(key(ident)) match {
      case Some(t) => t
      case None => throw new NoSuchTableException(ident)
    }

  /** Time travel (`SELECT ... FROM t VERSION AS OF n`): version n is the
    * table state after its n-th commit (0 = the empty just-created
    * table) — the Delta transaction-log read path the reference gets
    * from its platform, served from the table's own snapshot history.
    * Snapshots are O(1) to retain: every commit already replaces the row
    * array wholesale (copy-on-write), so history holds references, never
    * copies. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = GraftTableStore.tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"version must be an integer commit number, got '$version'")
    }
    t.snapshotAt(v, ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // identity partitioning is supported (it defines the COW rewrite
    // groups — see GraftTable's row-level path); any other transform must
    // fail, not silently drop: a table created "PARTITIONED BY" something
    // it doesn't honor lies to its creator
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        val name = t.references.head.fieldNames.mkString(".")
        if (!schema.fieldNames.contains(name))
          throw new IllegalArgumentException(
            s"partition column $name is not in the table schema")
        name
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog tables support only identity partition transforms " +
          s"(got $other)")
    }
    val t = new GraftTable(
      (ident.namespace() :+ ident.name()).mkString("."), schema, partCols)
    // atomic: two concurrent CREATEs must not both succeed (the loser's
    // table object could already be receiving a CTAS write)
    if (GraftTableStore.tables.putIfAbsent(key(ident), t).isDefined)
      throw new TableAlreadyExistsException(ident)
    t
  }

  /** `ALTER TABLE ... ADD COLUMNS` — the schema-evolution route the
    * reference reaches via Delta's `overwriteSchema`
    * (Notebooks/Batch_Bronze_to_Silver.Notebook/notebook-content.py:200):
    * new nullable columns append to the schema and every pre-evolution
    * row reads NULL in them. Other change kinds are rejected loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = GraftTableStore.tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    t.applyChanges(changes)
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftTableStore.tables.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = GraftTableStore.tables.getOrElse(key(oldIdent),
      throw new NoSuchTableException(oldIdent))
    // move the SAME object (a copy would detach in-flight writes whose
    // commit closure mutates this instance) and only then retire the old
    // key; losing the putIfAbsent race leaves the store untouched
    if (GraftTableStore.tables.putIfAbsent(key(newIdent), t).isDefined)
      throw new TableAlreadyExistsException(newIdent)
    t.rename((newIdent.namespace() :+ newIdent.name()).mkString("."))
    GraftTableStore.tables.remove(key(oldIdent))
  }
}

/** JVM-global backing store: (namespace, table) → [[GraftTable]] (whose
  * rows live inside the table object). Global so every session/catalog
  * instance in the JVM sees one table universe — the local-mode analog of
  * a shared metastore. */
object GraftTableStore {
  val tables: TrieMap[(Seq[String], String), GraftTable] = TrieMap.empty
}

/** One in-JVM table: readable, appendable, truncatable, and MERGE-able via
  * [[SupportsRowLevelOperations]]. Rows are stored as copied InternalRows.
  *
  * With identity `partitionCols`, the row-level path becomes
  * PER-PARTITION copy-on-write instead of whole-table: the operation's
  * scan implements [[SupportsRuntimeV2Filtering]] on the partition
  * columns, Spark's runtime group filter (the DPP-style subquery its
  * rewrite rules plan against the source join) narrows the scan to the
  * partitions that actually contain matched rows, and commit replaces
  * exactly the scanned groups — untouched partitions' stored rows are
  * carried over by reference, never rewritten. That is the delta-sized
  * rewrite a real COW table format does per file/partition. */
class GraftTable(initialName: String, initialSchema: StructType,
                 val partitionCols: Seq[String] = Nil)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsDeleteV2 {

  // evolves under ADD COLUMNS (append-only, so the partition ordinals
  // below stay valid for the table's whole life)
  @volatile private var tableSchema: StructType = initialSchema

  private val partOrdinals: Seq[Int] =
    partitionCols.map(initialSchema.fieldIndex)
  private val partTypes: Seq[DataType] =
    partOrdinals.map(initialSchema.fields(_).dataType)

  /** Schema evolution: nullable columns APPENDED to the schema; stored
    * pre-evolution rows are padded with NULLs under the same lock the
    * commit callbacks take (a real table format serves the fill at read
    * time from its transaction log — an in-JVM row store materializes it
    * once at alter time, same observable semantics). Append-only keeps
    * every partition ordinal and in-flight writer's row width valid;
    * anything else (drops, renames, type changes, positioned adds) is
    * rejected loudly rather than silently corrupting stored rows. */
  private[sources] def applyChanges(changes: Seq[TableChange]): Unit =
    synchronized {
      changes.foreach {
        case add: TableChange.AddColumn =>
          if (add.fieldNames.length != 1)
            throw new UnsupportedOperationException(
              "only top-level ADD COLUMNS is supported")
          val name = add.fieldNames.head
          if (tableSchema.fieldNames.exists(_.equalsIgnoreCase(name)))
            throw new IllegalArgumentException(s"column $name already exists")
          if (!add.isNullable)
            throw new UnsupportedOperationException(
              s"added column $name must be nullable: existing rows read NULL")
          if (add.position != null)
            throw new UnsupportedOperationException(
              "added columns append at the end (no FIRST/AFTER)")
          val oldFields = tableSchema.fields
          tableSchema = StructType(oldFields :+
            org.apache.spark.sql.types.StructField(name, add.dataType,
              nullable = true))
          rows = rows.map { r =>
            val vals = new Array[Any](oldFields.length + 1)
            var i = 0
            while (i < oldFields.length) {
              vals(i) = r.get(i, oldFields(i).dataType); i += 1
            }
            // vals(old length) stays null: pre-evolution rows read NULL
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              vals): InternalRow
          }
        case other => throw new UnsupportedOperationException(
          s"unsupported table change: $other")
      }
      snap() // schema evolution is a commit too
    }

  /** Partition-group key of a stored row (values of the identity
    * partition columns, in declaration order). */
  private[sources] def groupKeyOf(r: InternalRow): Seq[Any] =
    partOrdinals.lazyZip(partTypes).map((i, dt) => r.get(i, dt))

  @volatile private var tableName: String = initialName
  @volatile private var rows: Array[InternalRow] = Array.empty

  /** Commit history for time travel: (schema, rows) AFTER each commit,
    * index 0 = the empty just-created table. Row arrays are copy-on-write
    * everywhere (every install builds a new array), so entries hold
    * references — a snapshot costs one Vector cell, not a data copy. */
  @volatile private var history: Vector[(StructType, Array[InternalRow])] =
    Vector((initialSchema, Array.empty))
  private def snap(): Unit = history = history :+ ((tableSchema, rows))

  /** Read-only view of commit `v` (see GraftCatalog.loadTable(_, version)). */
  private[sources] def snapshotAt(
      v: Int, ident: Identifier): GraftSnapshotTable = {
    val h = history
    if (v < 0 || v >= h.length)
      throw new IllegalArgumentException(
        s"$ident has no version $v (versions 0..${h.length - 1})")
    val (schema, rs) = h(v)
    new GraftSnapshotTable(s"$tableName@v$v", schema, rs)
  }

  def currentRows: Array[InternalRow] = rows

  // Commit callbacks run driver-side but possibly from concurrent query
  // threads; `rows = rows ++ delivered` is a read-modify-write, so two
  // concurrent INSERTs into the same table could lose one batch without
  // the lock. Synchronizing on the table instance makes the documented
  // "atomic swap" hold under concurrent writers; readers stay lock-free
  // (volatile read of an immutable array).
  private[sources] def installAppend(delivered: Array[InternalRow]): Unit =
    synchronized { rows = rows ++ delivered; snap() }
  private[sources] def installReplace(delivered: Array[InternalRow]): Unit =
    synchronized { rows = delivered; snap() }

  /** Row-level (COW) commit: replace exactly the `touched` partition
    * groups with the delivered post-operation contents; rows of untouched
    * groups carry over BY REFERENCE. `None` = the runtime group filter
    * never ran (unpartitioned table, or an unrecognized predicate shape)
    * — the scanned group was the whole table, so the whole table swaps. */
  private[sources] def installReplaceGroups(delivered: Array[InternalRow],
      touched: Option[Set[Seq[Any]]]): Unit = synchronized {
    rows = touched match {
      case None => delivered
      case Some(groups) =>
        rows.filterNot(r => groups.contains(groupKeyOf(r))) ++ delivered
    }
    snap()
  }

  /** INSERT OVERWRITE of specific partition groups (static mode with a
    * partition predicate): delete the matching groups, then append. */
  private[sources] def installOverwriteGroups(delivered: Array[InternalRow],
      keys: Set[Seq[Any]]): Unit = synchronized {
    rows = rows.filterNot(r => keys.contains(groupKeyOf(r))) ++ delivered
    snap()
  }

  /** Dynamic-partition INSERT OVERWRITE: replace exactly the groups the
    * delivered rows land in; every other partition is untouched (the
    * same contract as the parquet-side s22 path, and Hive/Delta's
    * `partitionOverwriteMode=dynamic`). */
  private[sources] def installDynamicOverwrite(
      delivered: Array[InternalRow]): Unit = synchronized {
    val touched = delivered.map(groupKeyOf).toSet
    rows = rows.filterNot(r => touched.contains(groupKeyOf(r))) ++ delivered
    snap()
  }

  // ---- metadata-only DELETE ------------------------------------------
  // A DELETE whose condition is expressible over the identity partition
  // columns needs no rewrite at all: it is a partition drop — the 100 TB
  // operation a real table format serves from the transaction log without
  // touching a data file. Spark's metadata-delete rule consults
  // canDeleteWhere BEFORE planning the row-level fallback, so an
  // inexpressible condition (non-partition columns, unrecognized shape)
  // degrades to the COW route automatically.
  private def alwaysTrueOnly(filters: Array[Predicate]): Boolean =
    filters.isEmpty || filters.forall(_.name == "ALWAYS_TRUE")

  override def canDeleteWhere(filters: Array[Predicate]): Boolean =
    alwaysTrueOnly(filters) ||
      GroupPredicates.allowedKeys(filters, partitionCols).isDefined

  override def deleteWhere(filters: Array[Predicate]): Unit = synchronized {
    if (alwaysTrueOnly(filters)) rows = Array.empty
    else {
      val keys = GroupPredicates.allowedKeys(filters, partitionCols)
        .getOrElse(throw new UnsupportedOperationException(
          s"deleteWhere called with inexpressible filters " +
            s"${filters.mkString(", ")} — canDeleteWhere should have " +
            "routed this to the row-level rewrite"))
      rows = rows.filterNot(r => keys.contains(groupKeyOf(r)))
    }
    snap()
  }

  /** Catalog RENAME support: the same object keeps its rows and in-flight
    * writes; only the reported name moves. Locked with the install
    * callbacks so a rename never interleaves a commit's read-modify-write. */
  private[sources] def rename(newName: String): Unit =
    synchronized { tableName = newName }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  // a table created PARTITIONED BY must also REPORT its partitioning —
  // DESCRIBE/SHOW CREATE and any planner path keying off partitioning()
  // would otherwise see an unpartitioned table
  override def partitioning(): Array[Transform] =
    partitionCols.map(c => Expressions.identity(c)).toArray
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava

  // ---- read path -----------------------------------------------------
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, () => rows)

  // ---- plain write path (INSERT INTO/OVERWRITE / CTAS) ---------------
  // Four commit modes: append (INSERT INTO), full replace (truncate /
  // INSERT OVERWRITE in static mode with no partition predicate),
  // group overwrite (static INSERT OVERWRITE restricted to partition
  // predicates), and dynamic-partition overwrite (replace exactly the
  // groups the new rows land in). canOverwrite = false makes Spark's
  // V2Writes raise an analysis error — for OVERWRITE there is NO
  // rewrite fallback (unlike DELETE), so an inexpressible predicate
  // (e.g. a static PARTITION spec on a multi-column-partitioned table,
  // which GroupPredicates doesn't evaluate) fails loudly instead of
  // silently overwriting the wrong rows; truncate and dynamic modes
  // remain available for such tables.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate with SupportsOverwriteV2
      with SupportsDynamicOverwrite {
      private var install: Array[InternalRow] => Unit = installAppend

      override def truncate(): WriteBuilder = { install = installReplace; this }

      override def canOverwrite(filters: Array[Predicate]): Boolean =
        filters.forall(_.name == "ALWAYS_TRUE") ||
          GroupPredicates.allowedKeys(filters, partitionCols).isDefined

      override def overwrite(filters: Array[Predicate]): WriteBuilder = {
        if (filters.forall(_.name == "ALWAYS_TRUE")) install = installReplace
        else {
          val keys = GroupPredicates.allowedKeys(filters, partitionCols)
            .getOrElse(throw new UnsupportedOperationException(
              s"overwrite called with inexpressible filters " +
                s"${filters.mkString(", ")} — canOverwrite should have " +
                "routed this to delete-and-append"))
          install = installOverwriteGroups(_, keys)
        }
        this
      }

      override def overwriteDynamicPartitions(): WriteBuilder = {
        install = installDynamicOverwrite
        this
      }

      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftBatchWrite(install)
      }
    }

  // ---- row-level operations (MERGE / UPDATE / DELETE SQL) ------------
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()

      // the operation's scan defines the rewritten group set: for a
      // partitioned table a runtime-filterable scan (Spark's group-filter
      // subquery narrows it to the partitions with matched rows); for an
      // unpartitioned table the whole table. No column pruning in either —
      // the rewrite re-writes complete rows.
      @volatile private var rlScan: GraftRowLevelScan = _
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () =>
          if (partitionCols.isEmpty) new GraftScan(tableSchema, rows)
          else {
            rlScan = new GraftRowLevelScan(tableSchema, rows, partitionCols,
              groupKeyOf)
            rlScan
          }

      // group-based COW: the write receives the COMPLETE post-operation
      // contents of the scanned groups — commit swaps exactly those in
      // (plus inserted rows, which ride along in the delivery regardless
      // of group). Physical rows arrive prefixed with Spark's
      // __row_operation column (WRITE / WRITE_WITH_METADATA; deleted rows
      // simply don't arrive) — [[GraftRowLevelBatchWrite]] strips it.
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite =
              new GraftRowLevelBatchWrite(tableSchema,
                delivered => installReplaceGroups(delivered,
                  Option(rlScan).flatMap(_.scannedGroups)))
          }
        }

      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array.empty
    }
}

/** The row-level operation's scan over a PARTITIONED [[GraftTable]]:
  * advertises the identity partition columns as runtime-filter
  * attributes, so Spark's row-level group-filtering rule plans a
  * DPP-style subquery (target ⋈ source on the operation condition,
  * projected to the partition columns) and calls [[filter]] with the
  * partition values that actually contain matched rows. The scan then
  * returns only those groups' rows, records the group set, and the
  * table's commit replaces exactly that set. An unrecognized predicate
  * shape degrades to no pruning — a whole-table rewrite is correct,
  * just not delta-sized. */
class GraftRowLevelScan(schema: StructType, allRows: Array[InternalRow],
                        partCols: Seq[String],
                        groupKeyOf: InternalRow => Seq[Any])
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var kept: Array[InternalRow] = allRows
  /** Groups the rewrite must replace; None = all (no runtime filter). */
  @volatile private[sources] var scannedGroups: Option[Set[Seq[Any]]] = None

  override def filterAttributes(): Array[NamedReference] =
    partCols.map(Expressions.column).toArray

  override def filter(predicates: Array[Predicate]): Unit =
    GroupPredicates.allowedKeys(predicates, partCols).foreach { keys =>
      kept = allRows.filter(r => keys.contains(groupKeyOf(r)))
      // the touched set is what the filter SELECTED (not just non-empty
      // groups): a selected group whose rows all get deleted must still
      // be replaced (with nothing)
      scannedGroups = Some(keys)
    }

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    new GraftScan(schema, kept).planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftScan(schema, kept).createReaderFactory()
}

/** Conservative evaluator for the runtime-filter predicates Spark hands a
  * [[SupportsRuntimeV2Filtering]] scan: IN / = over a single identity
  * partition column (the shape the row-level group filter emits), plus
  * AND/OR composition. Returns None for anything else — the caller then
  * skips pruning, which is always correct. */
private[sources] object GroupPredicates {

  // the public v2 literal interface (LiteralValue itself is private[sql])
  private type Lit = org.apache.spark.sql.connector.expressions.Literal[_]

  /** Some(set of allowed single-column group keys) when every predicate
    * is a recognized shape on the one partition column (multiple
    * predicates AND together); None otherwise. */
  def allowedKeys(predicates: Array[Predicate],
                  partCols: Seq[String]): Option[Set[Seq[Any]]] = {
    if (partCols.length != 1 || predicates.isEmpty) return None
    val col = partCols.head
    val sets = predicates.toSeq.map(p => eval(p, col))
    if (sets.contains(None)) None
    else Some(sets.flatten.reduce(_ intersect _).map(Seq(_)))
  }

  private def refIs(e: org.apache.spark.sql.connector.expressions.Expression,
                    col: String): Boolean = e match {
    case r: NamedReference =>
      r.fieldNames.length == 1 && r.fieldNames.head.equalsIgnoreCase(col)
    case _ => false
  }

  private def eval(p: Predicate, col: String): Option[Set[Any]] =
    p.name() match {
      case "IN" =>
        val ch = p.children()
        if (ch.length >= 2 && refIs(ch.head, col) &&
          ch.tail.forall(_.isInstanceOf[Lit]))
          Some(ch.tail.map(_.asInstanceOf[Lit].value: Any).toSet)
        else None
      case "=" | "<=>" =>
        p.children() match {
          case Array(r, l: Lit) if refIs(r, col) => Some(Set(l.value: Any))
          case Array(l: Lit, r) if refIs(r, col) => Some(Set(l.value: Any))
          case _ => None
        }
      case "AND" =>
        val ch = p.children().collect { case q: Predicate => q }
        if (ch.length != 2) None
        else for (a <- eval(ch(0), col); b <- eval(ch(1), col))
          yield a intersect b
      case "OR" =>
        val ch = p.children().collect { case q: Predicate => q }
        if (ch.length != 2) None
        else for (a <- eval(ch(0), col); b <- eval(ch(1), col))
          yield a union b
      case _ => None
    }
}

/** Scan builder with column pruning: a query projecting 2 of 30 columns
  * reads 2-column rows (the DSv2 contract every real format honors —
  * kept here so plans over catalog tables show the pruned ReadSchema and
  * downstream operators never carry dead columns). `rows` is passed as a
  * thunk so the scan binds the table's CURRENT contents at build time,
  * after any earlier statement in the same query plan committed. */
class GraftScanBuilder(tableSchema: StructType, rows: () => Array[InternalRow])
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve table column order; an empty projection (count(*)) is legal
    required = StructType(
      tableSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = {
    val all = rows()
    if (required.length == tableSchema.length) new GraftScan(tableSchema, all)
    else {
      val idx = required.fields.map(f => tableSchema.fieldIndex(f.name))
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(idx.toIndexedSeq.map { i =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, tableSchema.fields(i).dataType, tableSchema.fields(i).nullable)
        })
      new GraftScan(required, all.map(r => proj(r).copy(): InternalRow))
    }
  }
}

/** Full-table scan over the stored rows, split into a handful of input
  * partitions so downstream operators parallelize. */
class GraftScan(schema: StructType, rows: Array[InternalRow])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val slices = math.max(1, math.min(8, rows.length))
    if (rows.isEmpty) Array(GraftInputPartition(Array.empty))
    else rows.grouped(math.ceil(rows.length.toDouble / slices).toInt)
      .map(GraftInputPartition.apply).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = p.asInstanceOf[GraftInputPartition].rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = it.next(); true } else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
    }
}

/** Rows ride inside the partition (driver → executor); UnsafeRow is
  * Externalizable, so this serializes in cluster mode too. */
case class GraftInputPartition(rows: Array[InternalRow]) extends InputPartition

/** Per-task writers buffer copies; commit messages carry them back and the
  * driver-side `install` callback swaps/extends the table's row array.
  * The factory is a standalone serializable value — the `install` closure
  * (which holds the non-serializable table) stays driver-side in commit. */
class GraftBatchWrite(install: Array[InternalRow] => Unit) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(None)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    install(messages.flatMap(_.asInstanceOf[GraftRowsMessage].rows))

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** The replace-data variant: group-based row-level writes deliver rows as
  * `[__row_operation:int] ++ tableColumns` (RowDeltaUtils contract —
  * WRITE(5) / WRITE_WITH_METADATA(6) rows are the group's surviving
  * contents; deleted rows never arrive). The writer keeps surviving rows,
  * projected back to the table schema as compact UnsafeRows. */
class GraftRowLevelBatchWrite(schema: StructType,
                              install: Array[InternalRow] => Unit)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(Some(schema))

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    install(messages.flatMap(_.asInstanceOf[GraftRowsMessage].rows))

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Executor-side writer factory. `opPrefixedSchema` = Some(tableSchema)
  * for row-level (replace-data) writes, whose incoming rows carry the
  * __row_operation prefix; None for plain appends. A row-level row that
  * arrives un-prefixed (numFields == schema size) passes through
  * unchanged, guarding against rewrite-rule variants that pre-project. */
case class GraftWriterFactory(opPrefixedSchema: Option[StructType])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      import org.apache.spark.sql.catalyst.util.RowDeltaUtils
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      private lazy val stripOp = UnsafeProjection.create(
        opPrefixedSchema.get.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable)
        }.toIndexedSeq)
      override def write(record: InternalRow): Unit = opPrefixedSchema match {
        case Some(schema) if record.numFields != schema.length =>
          val op = record.getInt(0)
          if (op == RowDeltaUtils.WRITE_OPERATION ||
            op == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION)
            buf += stripOp(record).copy()
        case _ => buf += record.copy()
      }
      override def commit(): WriterCommitMessage = GraftRowsMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

case class GraftRowsMessage(rows: Array[InternalRow])
    extends WriterCommitMessage

/** Frozen read-only view of one commit in a [[GraftTable]]'s history —
  * what `VERSION AS OF n` resolves to. Pruned reads reuse the live
  * table's scan builder; there is no write surface at all, so a DML
  * statement against a snapshot fails at analysis. */
class GraftSnapshotTable(snapName: String, snapSchema: StructType,
                         snapRows: Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = snapName
  override def schema(): StructType = snapSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(snapSchema, () => snapRows)
}
