package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The maintenance DDL surface as SQL (Delta's `OPTIMIZE` / `VACUUM` /
  * `RESTORE` statements): a delegating parser recognizes the three
  * maintenance verbs and plans them as runnable commands; every other
  * statement passes to Spark's parser untouched. Installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (injectParser), or
  * used directly through [[GraftMaintenance.sql]] when the session was
  * built without extensions.
  *
  * Grammar (case-insensitive; `t` is `catalog.ns….table` or `ns.table`):
  * {{{
  *   OPTIMIZE t [WHERE part-pred] [ZORDER BY (col [, col…])] [TARGET n ROWS]
  *   REORG TABLE t [WHERE part-pred] APPLY (PURGE)
  *   VACUUM t [RETAIN n SNAPSHOTS | RETAIN n HOURS] [DRY RUN]
  *   RESTORE TABLE t TO VERSION AS OF v | TIMESTAMP AS OF 'ts'
  *   CREATE [OR REPLACE] TABLE dst SHALLOW|DEEP CLONE src [VERSION AS OF v]
  *     — OR REPLACE onto an existing dst = the WAP publish
  *   ALTER TABLE t SET PARTITIONED BY (col [, col…])  — spec evolution
  *   ALTER TABLE t CREATE BRANCH b [RETAIN n SNAPSHOTS] [RETAIN h HOURS]
  *     | DROP BRANCH b — named refs; RETAIN declares the branch's own
  *     snapshot retention / ref age (Iceberg's maxRefAgeMs analog)
  *   ALTER TABLE t FAST FORWARD [main] TO b           — replay b onto main
  *   ALTER TABLE t CREATE TAG n [AS OF VERSION v] [RETAIN h HOURS]
  *     | DROP TAG n — h HOURS = tag expiry (aged-out tags drop and
  *     their segments reclaim on the next sweep)
  *   ALTER TABLE t CHERRY-PICK b VERSION v        — adopt one append
  *   ALTER TABLE t MERGE BRANCH b — squash-merge a diverged branch's
  *     net state as ONE commit (CDC = the reference state diff)
  *   CREATE [OR REPLACE] VIEW cat.ns.v [(aliases)]
  *     [TBLPROPERTIES ('k'='v', …)] AS query
  *     | ALTER VIEW cat.ns.v AS query
  *     | ALTER VIEW cat.ns.v SET|UNSET TBLPROPERTIES (…)
  *     | DROP VIEW [IF EXISTS] cat.ns.v | SHOW VIEWS IN cat.ns
  *     | SHOW CREATE VIEW cat.ns.v — persisted SQL views (ViewCatalog)
  *   DESC[RIBE] HISTORY t          — newest-first commit log
  *   DESC[RIBE] DETAIL t           — the table's physical census
  *   COPY INTO t FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
  *     [PATTERN = '<glob>'] [FORCE]
  * }}} */
class GraftSqlParser(delegate: ParserInterface,
                     session: Option[SparkSession] = None)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText, session).getOrElse(
      delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.@`]+?)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?(?:\s+TARGET\s+(\d+)\s+ROWS)?\s*;?\s*""".r
  private val Reorg =
    """(?is)\s*REORG\s+TABLE\s+([\w.@`]+?)(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.@`]+?)(?:\s+RETAIN\s+(\d+)\s+(SNAPSHOTS|HOURS))?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.@`]+?)\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w.@`]+?)\s+(SHALLOW|DEEP)\s+CLONE\s+([\w.@`]+?)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val Analyze =
    """(?is)\s*ANALYZE\s+TABLE\s+([\w.@`]+?)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+COLUMNS\s+([\w,`\s]+?)|\s+FOR\s+ALL\s+COLUMNS)?\s*;?\s*""".r
  private val EvolvePartitioning =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+SET\s+PARTITIONED\s+BY\s*\(([^)]*)\)\s*;?\s*""".r
  private val DescribeHistory =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.@`]+?)\s*;?\s*""".r
  private val DescribeDetail =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.@`]+?)\s*;?\s*""".r
  private val ShowPartitions =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.@`]+?)\s*;?\s*""".r
  private val CopyInto =
    """(?is)\s*COPY\s+INTO\s+([\w.@`]+?)\s+FROM\s+'([^']+)'(?:\s+FILEFORMAT\s*=\s*(\w+))?(?:\s+PATTERN\s*=\s*'([^']+)')?(\s+FORCE)?\s*;?\s*""".r
  // clause order: count window, then the TIME snapshot window (r19 —
  // `RETAIN h HOURS SNAPSHOTS`, which must match BEFORE the bare
  // `RETAIN h HOURS` ref-age clause or its trailing SNAPSHOTS keyword
  // would fail the whole statement), then the ref age
  private val CreateBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+CREATE\s+BRANCH\s+([\w.-]+)(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS\s+SNAPSHOTS)?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*""".r
  private val DropBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+DROP\s+BRANCH\s+([\w.-]+)\s*;?\s*""".r
  // r19: replace a branch's declared retention wholesale (no clauses =
  // clear); clause order mirrors CREATE BRANCH
  private val AlterBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+ALTER\s+BRANCH\s+([\w.-]+)(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS\s+SNAPSHOTS)?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*""".r
  private val FastForward =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+FAST\s+FORWARD\s+(?:main\s+)?TO\s+([\w.-]+)\s*;?\s*""".r
  private val CherryPick =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+CHERRY[-\s]?PICK\s+([\w.-]+)\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val MergeBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+MERGE\s+BRANCH\s+([\w.-]+)\s*;?\s*""".r
  private val CreateTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+CREATE\s+TAG\s+([\w.-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.@`]+?)\s+DROP\s+TAG\s+([\w.-]+)\s*;?\s*""".r
  // SQL views over a graft catalog (r18, DSv2 ViewCatalog): claimed
  // ONLY when the identifier's leading part names a registered graft
  // catalog — session-catalog / temp views delegate to Spark untouched
  private val CreateViewRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+?)(?:\s*\(([\w\s,`]*)\))?(?:\s+TBLPROPERTIES\s*\(([^)]*)\))?\s+AS\s+(.+?)\s*;?\s*""".r
  private val AlterViewRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.`]+?)\s+AS\s+(.+?)\s*;?\s*""".r
  private val AlterViewRenameRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.`]+?)\s+RENAME\s+TO\s+([\w.`]+?)\s*;?\s*""".r
  private val AlterViewSetPropsRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.`]+?)\s+SET\s+TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""".r
  private val AlterViewUnsetPropsRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.`]+?)\s+UNSET\s+TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""".r
  private val ShowCreateViewRe =
    """(?is)\s*SHOW\s+CREATE\s+VIEW\s+([\w.`]+?)\s*;?\s*""".r
  private val DropViewRe =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+?)\s*;?\s*""".r
  private val ShowViewsRe =
    """(?is)\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w.`]+?)\s*;?\s*""".r

  /** Identifier parts, or None for an unqualified single-part name —
    * those DELEGATE to Spark's parser (another extension may own the
    * statement; this one never hijacks what it cannot resolve).
    * Backtick-quoted segments tokenize BEFORE dot-splitting, so
    * `OPTIMIZE cat.ns.`my.table`` resolves to the right three parts
    * (a raw split('.') would cut the quoted name apart). Unbalanced
    * backticks also delegate — Spark's parser owns the error. */
  private def split(ident: String): Option[Seq[String]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var balanced = true
    while (i < ident.length && balanced) {
      ident.charAt(i) match {
        case '`' =>
          val close = ident.indexOf('`', i + 1)
          if (close < 0) balanced = false
          else { cur.append(ident.substring(i + 1, close)); i = close + 1 }
        case '.' => parts += cur.result(); cur.clear(); i += 1
        case c => cur.append(c); i += 1
      }
    }
    if (!balanced) None
    else {
      parts += cur.result()
      if (parts.length >= 2 && parts.forall(_.nonEmpty)) Some(parts.toSeq)
      else None
    }
  }

  /** True when `name` is a registered catalog backed by [[GraftCatalog]]
    * in the session (the signal that a leading identifier part is a
    * catalog reference rather than a nested-namespace segment). */
  private def isGraftCatalog(session: Option[SparkSession],
                             name: String): Boolean =
    session.exists { s =>
      try s.sessionState.catalogManager.isCatalogRegistered(name) &&
        s.sessionState.catalogManager.catalog(name).isInstanceOf[GraftCatalog]
      catch { case scala.util.control.NonFatal(_) => false }
    }

  /** The store behind a registered [[GraftCatalog]], for scoping a
    * catalog-qualified maintenance statement to exactly that catalog's
    * warehouse. */
  private def catalogStore(session: Option[SparkSession],
                           name: String): Option[GraftStoreState] =
    session.flatMap { s =>
      try s.sessionState.catalogManager.catalog(name) match {
        case g: GraftCatalog => Some(g.store)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Resolve parts to a store key AT RUN TIME: when the leading part is
    * a registered graft catalog, it is a catalog reference — it strips,
    * and the lookup SCOPES to that catalog's own store (two warehouses
    * may both hold an `ns.t`; a cross-store match would silently act on
    * the wrong table). Otherwise the full parts are a nested namespace
    * resolved across every known store, with a catalog-stripped
    * fallback only when the full key does not exist (sessions without a
    * bound SparkSession — the gateway — keep the permissive historical
    * behavior). */
  private def resolve(parts: Seq[String], session: Option[SparkSession])
      : (Seq[String], String, Option[GraftStoreState]) = {
    val stripped = (parts.tail.dropRight(1), parts.last)
    val full = (parts.dropRight(1), parts.last)
    if (parts.length >= 3 && isGraftCatalog(session, parts.head))
      (stripped._1, stripped._2, catalogStore(session, parts.head))
    else if (GraftTableStore.keyExists(full)) (full._1, full._2, None)
    else if (parts.length >= 3 &&
        GraftTableStore.keyExists(stripped))
      (stripped._1, stripped._2, None)
    else (full._1, full._2, None)
  }

  private def out(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, IntegerType, nullable = false)())

  private def outTyped(cols: (String, DataType)*): Seq[Attribute] =
    cols.map { case (n, t) => AttributeReference(n, t, nullable = false)() }

  /** UTC wall-clock text → epoch micros (the TIMESTAMP AS OF literal;
    * same parse the streaming `startingTimestamp` option uses — commit
    * timestamps are epoch-based, never JVM-local). */
  private def parseTsMicros(text: String): Long = {
    val t = text.trim
    val ldt =
      if (t.matches("\\d{4}-\\d{2}-\\d{2}"))
        java.time.LocalDate.parse(t).atStartOfDay
      else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  }

  /** True when this parser should CLAIM the statement: the name
    * resolves in the graft store, or its leading part names a graft
    * catalog (then a missing table is OUR loud error, not someone
    * else's statement). Without a bound session (direct parser use,
    * the gateway's parse step) claims are permissive. */
  private def claims(parts: Seq[String],
                     session: Option[SparkSession]): Boolean =
    session.isEmpty ||
      GraftTableStore.keyExists((parts.dropRight(1), parts.last)) ||
      (parts.length >= 3 &&
        (GraftTableStore.keyExists(
          (parts.tail.dropRight(1), parts.last)) ||
          isGraftCatalog(session, parts.head)))

  /** Some(command plan) when `sqlText` is a maintenance statement over a
    * qualified table name this parser claims. */
  def parseMaintenance(sqlText: String,
      session: Option[SparkSession] = None): Option[LogicalPlan] =
    sqlText match {
      case Optimize(ident, where, zcols, target) =>
        split(ident).filter(claims(_, session)).map { parts =>
          val rows = Option(target).map(_.toInt).getOrElse(1 << 20)
          GraftMaintenanceCommand(
            out("files_before", "files_after"), _ => {
              val (ns, t, scope) = resolve(parts, session)
              val w = Option(where).map(_.trim).filter(_.nonEmpty)
              val r =
                if (zcols == null)
                  GraftMaintenance.optimize(ns, t, rows, scope, w)
                else GraftMaintenance.zorderBy(ns, t,
                  zcols.split(',').toSeq.map(_.trim.stripPrefix("`")
                    .stripSuffix("`")).filter(_.nonEmpty), rows, scope, w)
              Seq(Row(r.filesBefore, r.filesAfter))
            })
        }
      case Reorg(ident, where) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(outTyped(
            ("files_purged", IntegerType),
            ("rows_purged", org.apache.spark.sql.types.LongType)), _ => {
            val (ns, t, scope) = resolve(parts, session)
            val (fp, rp) = GraftMaintenance.reorgPurge(ns, t, scope,
              Option(where).map(_.trim).filter(_.nonEmpty))
            Seq(Row(fp, rp))
          })
        }
      case Vacuum(ident, keep, unit, dry) =>
        split(ident).filter(claims(_, session)).map { parts =>
          val hours = Option(unit).exists(_.equalsIgnoreCase("HOURS"))
          // no explicit RETAIN → the declared-retention sentinel: the
          // chain's retention property (r18) governs, else the default
          // of 1; explicit values keep the >= 1 floor contract
          val keepLast = Option(keep).map(_.toInt)
            .getOrElse(GraftTable.VacuumDeclaredRetention)
          if (dry != null)
            // Delta's DRY RUN: the reclaim census, nothing deleted
            GraftMaintenanceCommand(outTyped(
              ("snapshots_would_retire", IntegerType),
              ("reclaimable_segments", IntegerType),
              ("reclaimable_bytes", org.apache.spark.sql.types.LongType)),
              _ => {
                val (ns, t, scope) = resolve(parts, session)
                val (r, s, b) =
                  if (hours) GraftMaintenance.vacuumDryRunHours(
                    ns, t, keep.toDouble, scope)
                  else GraftMaintenance.vacuumDryRun(ns, t, keepLast, scope)
                Seq(Row(r, s, b))
              })
          else
            GraftMaintenanceCommand(out("snapshots_retired"), _ => {
              val (ns, t, scope) = resolve(parts, session)
              Seq(Row(
                if (hours)
                  GraftMaintenance.vacuumHours(ns, t, keep.toDouble, scope)
                else GraftMaintenance.vacuum(ns, t, keepLast, scope)))
            })
        }
      case Restore(ident, v, ts) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("restored_to_version"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            val restored =
              if (v != null) {
                GraftMaintenance.restore(ns, t, v.toInt, scope)
                v.toInt
              } else
                // TIMESTAMP AS OF: resolve to the latest commit at or
                // before the UTC instant (Delta's timestamp restore)
                GraftMaintenance.restoreTimestamp(ns, t,
                  parseTsMicros(ts), scope)
            Seq(Row(restored))
          })
        }
      case Clone(orReplace, dstIdent, kind, srcIdent, v) =>
        // `CREATE [OR REPLACE] TABLE dst SHALLOW|DEEP CLONE src
        // [VERSION AS OF n]` — Delta's clone statement. Claimed off the
        // SOURCE; the clone registers in the source's own store
        // universe, and a dst qualified with a DIFFERENT graft catalog
        // refuses loudly (cross-warehouse clones would share segment
        // references across reclaim domains — silent invalidation).
        // With OR REPLACE onto an EXISTING table, this is the WAP
        // PUBLISH: the destination adopts the source's state as ONE
        // commit that CDF/streams read straight through (field ids
        // shared — see GraftTable.publishFrom).
        (split(srcIdent), split(dstIdent)) match {
          case (Some(srcParts), Some(dstParts))
              if claims(srcParts, session) =>
            Some(GraftMaintenanceCommand(
              out("files_shared", "files_deepened"), _ => {
                val (sns, st, sScope) = resolve(srcParts, session)
                val (dns, dt) =
                  if (dstParts.length >= 3 &&
                      isGraftCatalog(session, dstParts.head)) {
                    val dScope = catalogStore(session, dstParts.head)
                    if (dScope.isDefined && sScope.isDefined &&
                        (dScope.get ne sScope.get))
                      throw new IllegalArgumentException(
                        s"cannot clone across catalogs: destination " +
                          s"${dstParts.head} is a different warehouse " +
                          "than the source's — shared segment " +
                          "references cannot cross reclaim domains")
                    (dstParts.tail.dropRight(1), dstParts.last)
                  } else (dstParts.dropRight(1), dstParts.last)
                val replacing = orReplace != null &&
                  GraftTableStore.keyExistsIn((dns, dt), sScope)
                val shared =
                  if (replacing)
                    GraftMaintenance.publish(sns, st, dns, dt,
                      Option(v).map(_.toInt), sScope)
                  else
                    GraftMaintenance.cloneTable(sns, st, dns, dt,
                      Option(v).map(_.toInt), sScope)
                val deepened =
                  if (kind.equalsIgnoreCase("DEEP"))
                    GraftMaintenance.deepenClone(dns, dt, sScope)
                  else 0
                Seq(Row(shared, deepened))
              }))
          case _ => None
        }
      // COPY INTO t FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
      // [PATTERN = '<glob>'] [FORCE] — Delta's idempotent bulk-file
      // ingest: files already loaded into THIS table are recognized
      // from the persisted per-file ledger (identity = path+size+mtime,
      // so a re-uploaded file with new content loads again) and skipped
      // (plan-time probe reads through to foreign commits; the marks
      // publish atomically WITH the append's commit, so a
      // crash-and-retry or a concurrent copier converges instead of
      // double-loading). FORCE loads the matched files regardless of
      // marks (duplicates accepted by the caller — Delta's
      // 'force'='true'). One commit per COPY execution, whatever the
      // file count — the pending files read as one distributed scan and
      // land as ordinary executor-written segments; rows_loaded reads
      // back from that commit's own log entry, never a second scan.
      case CopyInto(ident, dir, fmt, pattern, forceKw) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(outTyped(
            ("files_loaded", IntegerType),
            ("files_skipped", IntegerType),
            ("rows_loaded", org.apache.spark.sql.types.LongType)), sp => {
            val format = Option(fmt).map(_.trim.toUpperCase)
              .getOrElse("PARQUET")
            if (!Set("PARQUET", "CSV", "JSON").contains(format))
              throw new UnsupportedOperationException(
                s"COPY INTO: FILEFORMAT $format is not supported " +
                  "(PARQUET, CSV or JSON)")
            val force = forceKw != null
            val (ns, t, scope) = resolve(parts, session)
            val root = java.nio.file.Paths.get(dir)
            if (!java.nio.file.Files.isDirectory(root))
              throw new IllegalArgumentException(
                s"COPY INTO: source '$dir' is not a directory")
            // PATTERN globs against the path RELATIVE to the source dir
            // (default: any file of the format's extension anywhere
            // below it). A path with ANY component starting with '_' or
            // '.' never matches — Spark/Delta's FileIndex convention —
            // so a concurrent writer's in-flight `_temporary/…` task
            // attempts and `.staging/` dirs are invisible, not ingested
            // and permanently marked as loaded.
            val ext = format.toLowerCase
            val matcher = java.nio.file.FileSystems.getDefault
              .getPathMatcher("glob:" + Option(pattern).getOrElse(
                s"{*.$ext,**/*.$ext}"))
            val files: Seq[(String, Long, Long)] = {
              val w = java.nio.file.Files.walk(root)
              try {
                import scala.jdk.CollectionConverters._
                w.iterator().asScala
                  .filter(java.nio.file.Files.isRegularFile(_))
                  .filter { p =>
                    val rel = root.relativize(p)
                    (0 until rel.getNameCount).forall { i =>
                      val n = rel.getName(i).toString
                      !n.startsWith("_") && !n.startsWith(".")
                    }
                  }
                  .filter(p => matcher.matches(root.relativize(p)))
                  .map { p =>
                    (p.toAbsolutePath.normalize.toString,
                      java.nio.file.Files.size(p),
                      java.nio.file.Files.getLastModifiedTime(p).toMillis)
                  }
                  .toSeq.sortBy(_._1)
              } finally w.close()
            }
            val (pending, skipped) =
              GraftMaintenance.copyPending(ns, t, files, scope, force)
            if (pending.isEmpty) Seq(Row(0, skipped, 0L))
            else {
              val schema = GraftMaintenance.schemaOf(ns, t, scope)
              val df = GraftCopyReader.conform(
                sp, format, pending.map(_._1), schema)
              val versionBefore =
                GraftMaintenance.tableVersion(ns, t, scope)
              val w = df.writeTo(parts.map(p => s"`$p`").mkString("."))
                .option(GraftTable.CopyKeysOption,
                  pending.map(_._2).mkString(","))
                .option(GraftTable.CopyParamsOption,
                  (Seq(s"source=$dir", s"fileformat=$format",
                    s"n_files=${pending.size}") ++
                    Option(pattern).map(p => s"pattern=$p") ++
                    (if (force) Seq("force=true") else Nil)).mkString("\n"))
              (if (force) w.option(GraftTable.CopyForceOption, "true")
               else w).append()
              // rows_loaded = what the commit actually wrote (sum of
              // the delivered files' row counts off its log entry) —
              // a pre-write count() would scan the landing files twice
              // and could diverge if one were rewritten between jobs
              val rows =
                GraftMaintenance.copyCommitRows(ns, t, versionBefore,
                  Some(dir), scope)
              Seq(Row(pending.size, skipped, rows))
            }
          })
        }

      // ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …|FOR ALL
      // COLUMNS]: ONE distributed aggregation pass over the table
      // (HLL ndv + null counts + string lengths, all map-side-combined
      // — never a per-column scan), persisted into the commit log and
      // served to Catalyst's CBO through the scan's columnStats().
      // Spark refuses ANALYZE on v2 tables; this parser owns it for
      // graft catalogs.
      case Analyze(ident, colsTxt) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(outTyped(
            ("column", org.apache.spark.sql.types.StringType),
            ("ndv", org.apache.spark.sql.types.LongType),
            ("null_count", org.apache.spark.sql.types.LongType),
            ("avg_len", org.apache.spark.sql.types.LongType),
            ("max_len", org.apache.spark.sql.types.LongType)), sp => {
            import org.apache.spark.sql.functions._
            val (ns, t, scope) = resolve(parts, session)
            val schema = GraftMaintenance.schemaOf(ns, t, scope)
            val targets: Seq[String] = Option(colsTxt) match {
              case None => schema.fieldNames.toSeq
              case Some(txt) =>
                val names = txt.split(',').map(_.trim.stripPrefix("`")
                  .stripSuffix("`")).filter(_.nonEmpty).toSeq
                names.foreach { c =>
                  if (!schema.fieldNames.contains(c))
                    throw new IllegalArgumentException(
                      s"ANALYZE: no such column $c")
                }
                names
            }
            val df = sp.table(parts.map(p => s"`$p`").mkString("."))
            // equi-height HISTOGRAMS join the pass when Spark's own
            // knob opts in (spark.sql.statistics.histogram.enabled):
            // bin EDGES are the (0, 1/n, …, 1) approximate percentiles,
            // computed inside the SAME distributed aggregation as
            // ndv/nulls/lengths; per-bin ndv takes one more distributed
            // pass (ApproxCountDistinctForIntervals — the aggregate
            // Spark's own ANALYZE uses). Numeric columns only.
            val histOn = sp.conf.get(
              "spark.sql.statistics.histogram.enabled", "false").toBoolean
            val histBins = sp.conf.get(
              "spark.sql.statistics.histogram.numBins", "254").toInt
            // the histogram domain is the column's CATALYST-INTERNAL
            // representation as a double — numbers as themselves, DATE
            // as epoch days, TIMESTAMP as epoch micros (exact below
            // 2⁵³) — because that is the domain FilterEstimation
            // converts range-predicate literals into
            def histExprOf(c: String): Option[org.apache.spark.sql.Column] =
              schema.fields(schema.fieldIndex(c)).dataType match {
                case org.apache.spark.sql.types.ByteType |
                     org.apache.spark.sql.types.ShortType |
                     org.apache.spark.sql.types.IntegerType |
                     org.apache.spark.sql.types.LongType |
                     org.apache.spark.sql.types.FloatType |
                     org.apache.spark.sql.types.DoubleType =>
                  Some(col(c).cast("double"))
                case org.apache.spark.sql.types.DateType =>
                  Some(datediff(col(c), to_date(lit("1970-01-01")))
                    .cast("double"))
                case org.apache.spark.sql.types.TimestampType =>
                  Some(unix_micros(col(c)).cast("double"))
                case _ => None
              }
            val histTargets =
              if (histOn) targets.filter(histExprOf(_).isDefined) else Nil
            val aggs = Seq(count(lit(1)).as("__rows")) ++
              targets.flatMap { c =>
              val isStr = schema.fields(schema.fieldIndex(c)).dataType ==
                org.apache.spark.sql.types.StringType
              Seq(
                approx_count_distinct(col(c)).as(s"__ndv_$c"),
                sum(when(col(c).isNull, 1L).otherwise(0L))
                  .as(s"__nul_$c")) ++
                (if (isStr) Seq(
                  ceil(coalesce(avg(length(col(c))), lit(0.0)))
                    .cast("long").as(s"__avg_$c"),
                  coalesce(max(length(col(c))), lit(0))
                    .cast("long").as(s"__max_$c"))
                 else Nil) ++
                (if (histTargets.contains(c)) {
                  val qs = (0 to histBins).map(_.toDouble / histBins)
                  Seq(percentile_approx(histExprOf(c).get,
                    typedLit(qs.toArray), lit(10000)).as(s"__pct_$c"))
                } else Nil)
            }
            val r = df.agg(aggs.head, aggs.tail: _*).head()
            // per-bin ndv over the percentile edges (skipped when a
            // column was all-null — no edges to bound the intervals)
            val edgesByCol: Map[String, IndexedSeq[Double]] =
              histTargets.flatMap { c =>
                Option(r.getAs[scala.collection.Seq[Double]](s"__pct_$c"))
                  .filter(_.length == histBins + 1)
                  .map(es => c -> es.toIndexedSeq)
              }.toMap
            val binNdv: Map[String, Array[Long]] =
              if (edgesByCol.isEmpty) Map.empty
              else {
                // ApproxCountDistinctForIntervals is the aggregate
                // Spark's own ANALYZE uses for per-bin ndv; surfaced as
                // a session temp function (the repo's custom-expression
                // registration idiom) since it has no public builder
                sp.sessionState.functionRegistry
                  .createOrReplaceTempFunction("graft_acd_intervals",
                    exprs => new org.apache.spark.sql.catalyst.expressions
                      .aggregate.ApproxCountDistinctForIntervals(
                        exprs.head, exprs(1)).toAggregateExpression(),
                    "built-in")
                val iAggs = edgesByCol.toSeq.map { case (c, edges) =>
                  call_function("graft_acd_intervals",
                    histExprOf(c).get, typedLit(edges.toArray))
                    .as(s"__bnv_$c")
                }
                val br = df.agg(iAggs.head, iAggs.tail: _*).head()
                edgesByCol.keys.map(c =>
                  c -> br.getAs[scala.collection.Seq[Long]](s"__bnv_$c")
                    .toArray).toMap
              }
            val stats = targets.map { c =>
              val dt = schema.fields(schema.fieldIndex(c)).dataType
              val ndv = r.getAs[Long](s"__ndv_$c")
              val nul = r.getAs[Long](s"__nul_$c")
              val (al, ml) =
                if (dt == org.apache.spark.sql.types.StringType)
                  (r.getAs[Long](s"__avg_$c"), r.getAs[Long](s"__max_$c"))
                else (dt.defaultSize.toLong, dt.defaultSize.toLong)
              val base = Array(ndv, nul, al, ml)
              c -> (edgesByCol.get(c) match {
                case Some(edges) =>
                  // histogram packing (see GraftScan.columnStats):
                  // [ndv, nulls, avgLen, maxLen,
                  //  heightBits, minBits, maxBits, nBins,
                  //  (loBits, hiBits, binNdv)*] — double bits ride the
                  // existing Array[Long] stats value, so the log
                  // format, restart fold and evolution/replace carry
                  // are all unchanged
                  val ndvs = binNdv(c)
                  val rows = r.getAs[Long]("__rows")
                  val height =
                    (rows - nul).toDouble / math.max(1, histBins)
                  import java.lang.Double.doubleToRawLongBits
                  base ++ Array(doubleToRawLongBits(height),
                    doubleToRawLongBits(edges.head),
                    doubleToRawLongBits(edges.last),
                    histBins.toLong) ++
                    (0 until histBins).flatMap(i => Seq(
                      doubleToRawLongBits(edges(i)),
                      doubleToRawLongBits(edges(i + 1)),
                      if (i < ndvs.length) ndvs(i) else 0L))
                case None => base
              })
            }.toMap
            // FOR COLUMNS merges over prior stats; the commit persists
            GraftMaintenance.setColumnStats(ns, t, stats, scope)
            stats.toSeq.sortBy(_._1).map { case (c, vs) =>
              Row(c, vs(0), vs(1), vs(2), vs(3))
            }
          })
        }

      // ALTER TABLE … CREATE BRANCH / DROP BRANCH / FAST FORWARD:
      // Iceberg-style named refs over the durable log — a branch is its
      // own commit chain (isolated lease, log/ckpt namespaces) over the
      // shared segment store, addressed `t@branch`, and FAST FORWARD
      // replays the branch's commit suffix onto main verbatim (the CDF
      // sees every branch commit, not one state diff). Standard SQL has
      // none of these shapes, so unmatched statements fall through.
      case CreateBranch(ident, b, retain, retainHrs, age) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("fork_version"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.createBranch(ns, t, b, scope,
              Option(retain).map(_.toInt),
              Option(age).map(_.toDouble),
              Option(retainHrs).map(_.toDouble))))
          })
        }
      case DropBranch(ident, b) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("branches_dropped"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            GraftMaintenance.dropBranch(ns, t, b, scope)
            Seq(Row(1))
          })
        }
      case AlterBranch(ident, b, retain, retainHrs, age) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("properties_declared"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.alterBranch(ns, t, b, scope,
              Option(retain).map(_.toInt),
              Option(age).map(_.toDouble),
              Option(retainHrs).map(_.toDouble))))
          })
        }
      case FastForward(ident, b) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("commits_adopted"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.fastForward(ns, t, b, scope)))
          })
        }
      // ALTER TABLE t CHERRY-PICK b VERSION n: adopt one append-only
      // branch commit onto a DIVERGED main (the FAST FORWARD refusal's
      // surgical remedy)
      case CherryPick(ident, b, v) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("picked_to_version"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.cherryPick(ns, t, b, v.toInt, scope)))
          })
        }
      // ALTER TABLE t MERGE BRANCH b (r18): squash-merge the branch
      // head's net state onto a diverged main as ONE commit — the
      // remedy FAST FORWARD's refusal names
      case MergeBranch(ident, b) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("merged_to_version"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.mergeBranch(ns, t, b, scope)))
          })
        }
      // ALTER TABLE … CREATE TAG name [AS OF VERSION n] / DROP TAG:
      // Iceberg-style immutable refs — a named, retention-pinned
      // snapshot readable as `t@name`
      case CreateTag(ident, tag, v, age) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("tagged_version"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            Seq(Row(GraftMaintenance.createTag(ns, t, tag,
              Option(v).map(_.toInt), scope,
              Option(age).map(_.toDouble))))
          })
        }
      case DropTag(ident, tag) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("tags_dropped"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            GraftMaintenance.dropTag(ns, t, tag, scope)
            Seq(Row(1))
          })
        }

      // SQL views (r18, DSv2 ViewCatalog): persisted, inlined-at-read
      // definitions. Claimed only for a catalog-qualified name whose
      // leading part is a registered graft catalog — every other
      // CREATE/ALTER/DROP VIEW (temp views, the session catalog)
      // delegates to Spark untouched.
      case CreateViewRe(orReplace, ident, colList, propsTxt, body) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("created"), s => {
              GraftViewDdl.createOrReplace(s, parts, Option(colList),
                body, orReplace = orReplace != null,
                requireExists = false, propsTxt = Option(propsTxt))
              Seq(Row(1))
            })
          }
      // ALTER VIEW ... SET/UNSET TBLPROPERTIES — the ViewChange surface
      // over SQL (Delta/Iceberg view properties); SHOW CREATE VIEW —
      // the reproducible-DDL introspection. Ordered BEFORE the AS form
      // (which cannot match these shapes anyway — it requires AS).
      // ALTER VIEW old RENAME TO new (r19): rides the ViewCatalog's
      // rename — same-catalog only (a cross-catalog move would be a
      // copy, not a rename); the new name may be bare or qualified by
      // the SAME catalog+namespace. Ordered before the props forms
      // (which cannot match — they require SET/UNSET).
      case AlterViewRenameRe(ident, newIdent) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("renamed"), s => {
              val np = split(newIdent).getOrElse(Seq(newIdent.trim
                .stripPrefix("`").stripSuffix("`")))
              // a 2-part target (ns.v2, the usual way users type it)
              // anchors to the SOURCE's catalog before the same-place
              // comparison — refusing it claimed a cross-catalog move
              // that wasn't one (r19-advice fix)
              val target =
                if (np.length == 1) parts.dropRight(1) :+ np.head
                else if (np.length == parts.length - 1)
                  parts.head +: np
                else np
              if (target.length != parts.length ||
                  target.dropRight(1) != parts.dropRight(1))
                throw new IllegalArgumentException(
                  s"ALTER VIEW ${parts.mkString(".")} RENAME TO " +
                    s"${np.mkString(".")}: a rename stays in its " +
                    "catalog and namespace — CREATE the view there " +
                    "and DROP this one to move it")
              GraftViewDdl.catalogOf(s, parts.head).renameView(
                org.apache.spark.sql.connector.catalog.Identifier
                  .of(parts.tail.dropRight(1).toArray, parts.last),
                org.apache.spark.sql.connector.catalog.Identifier
                  .of(target.tail.dropRight(1).toArray, target.last))
              Seq(Row(1))
            })
          }
      case AlterViewSetPropsRe(ident, propsTxt) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("properties_set"), s => {
              val kvs = GraftViewDdl.parseProps(propsTxt)
              GraftViewDdl.catalogOf(s, parts.head).alterView(
                org.apache.spark.sql.connector.catalog.Identifier
                  .of(parts.tail.dropRight(1).toArray, parts.last),
                kvs.map { case (k, v) =>
                  org.apache.spark.sql.connector.catalog.ViewChange
                    .setProperty(k, v)
                }: _*)
              Seq(Row(kvs.length))
            })
          }
      case AlterViewUnsetPropsRe(ident, propsTxt) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("properties_unset"), s => {
              val keys = GraftViewDdl.parsePropKeys(propsTxt)
              GraftViewDdl.catalogOf(s, parts.head).alterView(
                org.apache.spark.sql.connector.catalog.Identifier
                  .of(parts.tail.dropRight(1).toArray, parts.last),
                keys.map(org.apache.spark.sql.connector.catalog
                  .ViewChange.removeProperty): _*)
              Seq(Row(keys.length))
            })
          }
      case ShowCreateViewRe(ident) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(outTyped(
              ("createview_stmt", org.apache.spark.sql.types.StringType)),
              s => {
                val cat = GraftViewDdl.catalogOf(s, parts.head)
                val v = cat.loadView(
                  org.apache.spark.sql.connector.catalog.Identifier
                    .of(parts.tail.dropRight(1).toArray, parts.last))
                Seq(Row(GraftViewDdl.showCreate(parts, v)))
              })
          }
      case AlterViewRe(ident, body) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("altered"), s => {
              GraftViewDdl.createOrReplace(s, parts, None, body,
                orReplace = true, requireExists = true)
              Seq(Row(1))
            })
          }
      case DropViewRe(ifExists, ident) =>
        split(ident)
          .filter(p => p.length >= 3 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(out("dropped"), s => {
              val vIdent = org.apache.spark.sql.connector.catalog
                .Identifier.of(parts.tail.dropRight(1).toArray, parts.last)
              val dropped = GraftViewDdl.catalogOf(s, parts.head)
                .dropView(vIdent)
              if (!dropped && ifExists == null)
                throw new org.apache.spark.sql.catalyst.analysis
                  .NoSuchViewException(vIdent)
              Seq(Row(if (dropped) 1 else 0))
            })
          }
      case ShowViewsRe(ident) =>
        split(ident)
          .filter(p => p.length >= 2 && isGraftCatalog(session, p.head))
          .map { parts =>
            GraftMaintenanceCommand(outTyped(
              ("namespace", org.apache.spark.sql.types.StringType),
              ("viewName", org.apache.spark.sql.types.StringType)), s => {
              GraftViewDdl.catalogOf(s, parts.head)
                .listViews(parts.tail: _*).toSeq
                .map(i => Row(i.namespace().mkString("."), i.name()))
            })
          }

      // ALTER TABLE … SET PARTITIONED BY (…): partition-spec evolution
      // without a rewrite (Iceberg's). Every other ALTER TABLE shape
      // falls through to Spark's parser — this regex requires the
      // SET PARTITIONED BY clause, which standard SQL does not have.
      case EvolvePartitioning(ident, colsTxt) =>
        split(ident).filter(claims(_, session)).map { parts =>
          GraftMaintenanceCommand(out("files_degrouped"), _ => {
            val (ns, t, scope) = resolve(parts, session)
            val cols = colsTxt.split(',').map(_.trim.stripPrefix("`")
              .stripSuffix("`")).filter(_.nonEmpty).toSeq
            Seq(Row(
              GraftMaintenance.evolvePartitioning(ns, t, cols, scope)))
          })
        }

      // Delta's introspection statements, served as REWRITES onto the
      // `$history` / `$detail` meta tables (already ordinary relations
      // with zone-mapped files): the statement stays fully declarative —
      // projections/filters over DESCRIBE HISTORY push into the scan
      // like any other query, nothing materializes driver-side here.
      case DescribeHistory(ident) =>
        split(ident).filter(claims(_, session)).map { parts =>
          import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
          import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
          import org.apache.spark.sql.catalyst.plans.logical.Sort
          // newest-first, Delta's DESCRIBE HISTORY ordering
          Sort(Seq(SortOrder(UnresolvedAttribute("version"), Descending)),
            global = true,
            UnresolvedRelation(parts.init :+ (parts.last + "$history")))
        }
      case DescribeDetail(ident) =>
        split(ident).filter(claims(_, session)).map { parts =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
            parts.init :+ (parts.last + "$detail"))
        }
      // SHOW PARTITIONS on a graft table: Spark refuses the statement
      // for v2 tables — rewrite it onto the `$partitions` census
      // relation instead (declarative, prunable, versioned elsewhere).
      // Non-graft tables pass through to Spark's own statement.
      case ShowPartitions(ident) =>
        split(ident).filter(claims(_, session)).map { parts =>
          import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
          import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
          import org.apache.spark.sql.catalyst.plans.logical.Sort
          Sort(Seq(SortOrder(UnresolvedAttribute("partition"), Ascending)),
            global = true,
            UnresolvedRelation(parts.init :+ (parts.last + "$partitions")))
        }
      case _ => None
    }

  /** The SQL text a DESCRIBE statement rewrites to — the gateway path
    * ([[GraftMaintenance.sql]] without the parser extension) routes the
    * rewrite through `spark.sql`, which cannot execute a raw
    * LogicalPlan from outside Spark's package. Shares the regexes with
    * [[parseMaintenance]] so the two paths can never drift. */
  def describeRewriteSql(sqlText: String): Option[String] = {
    def quoted(parts: Seq[String]): String =
      parts.map(p => s"`$p`").mkString(".")
    sqlText match {
      case DescribeHistory(ident) => split(ident).map(parts =>
        s"SELECT * FROM ${quoted(parts.init :+ (parts.last + "$history"))} " +
          "ORDER BY version DESC")
      case DescribeDetail(ident) => split(ident).map(parts =>
        s"SELECT * FROM ${quoted(parts.init :+ (parts.last + "$detail"))}")
      case ShowPartitions(ident) => split(ident).map(parts =>
        s"SELECT * FROM ${quoted(parts.init :+ (parts.last + "$partitions"))} " +
          "ORDER BY partition")
      case _ => None
    }
  }
}

/** A parsed maintenance statement: runs driver-side at execution (the
  * ops are metadata/log work), emitting its census as the result rows. */
case class GraftMaintenanceCommand(
    override val output: Seq[Attribute],
    body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
}

/** Execution of the view DDL statements (r18): analyze the body ONCE
  * at create time (schema + output-column capture — the query never
  * runs), then hand the definition to the catalog's [[GraftCatalog]]
  * ViewCatalog surface. */
private[sources] object GraftViewDdl {

  /** The last CREATE/REPLACE VIEW's portability lint (r19), for
    * diagnostics and the spec pin: Some((view, offending names)) when
    * the body catalog-qualified a table, None when it was portable.
    * The user-facing surface is the CREATE-time log warning. */
  @volatile var lastPortabilityLint: Option[(String, Seq[String])] = None
  import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}

  def catalogOf(s: SparkSession, name: String): GraftCatalog =
    s.sessionState.catalogManager.catalog(name).asInstanceOf[GraftCatalog]

  private val PropRe = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val KeyRe = """'([^']*)'""".r

  /** `'k'='v', 'k2'='v2'` → pairs; malformed text refuses loudly. */
  def parseProps(txt: String): Seq[(String, String)] = {
    val pairs = PropRe.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toSeq
    if (pairs.isEmpty) throw new IllegalArgumentException(
      s"SET TBLPROPERTIES needs 'key'='value' pairs, got: $txt")
    pairs
  }

  /** `'k', 'k2'` → keys (UNSET form). */
  def parsePropKeys(txt: String): Seq[String] = {
    val keys = KeyRe.findAllMatchIn(txt).map(_.group(1)).toSeq
    if (keys.isEmpty) throw new IllegalArgumentException(
      s"UNSET TBLPROPERTIES needs 'key' names, got: $txt")
    keys
  }

  /** Reproducible DDL for SHOW CREATE VIEW: the statement this parser
    * accepts back — aliases when declared, properties when present. */
  def showCreate(parts: Seq[String],
      v: org.apache.spark.sql.connector.catalog.View): String = {
    val aliases =
      if (v.columnAliases().isEmpty) ""
      else v.columnAliases().mkString(" (", ", ", ")")
    val props = {
      import scala.jdk.CollectionConverters._
      val m = v.properties().asScala.toSeq.sortBy(_._1)
      if (m.isEmpty) ""
      else m.map { case (k, q) => s"'$k'='$q'" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    }
    s"CREATE VIEW ${parts.mkString(".")}$aliases$props\nAS ${v.query()}"
  }

  def createOrReplace(s: SparkSession, parts: Seq[String],
      colList: Option[String], body: String, orReplace: Boolean,
      requireExists: Boolean, propsTxt: Option[String] = None): Unit = {
    val cat = catalogOf(s, parts.head)
    val ns = parts.tail.dropRight(1)
    val ident = Identifier.of(ns.toArray, parts.last)
    // refuse cycles BEFORE analysis — direct AND transitive: the
    // stored text would otherwise inline itself forever at read time
    // (an indirect cycle only dies at the analyzer's max-iterations
    // with a cryptic error; OR REPLACE would even analyze cleanly
    // against the OLD definition). The walk follows every referenced
    // VIEW's stored body — views are few and bodies parse in ms.
    val cm = s.sessionState.catalogManager
    val self = (parts.head +: ns :+ parts.last).map(_.toLowerCase)
    def qualifiedRefs(sql: String, curCat: String,
        curNs: Seq[String]): Seq[Seq[String]] =
      s.sessionState.sqlParser.parsePlan(sql).collect {
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedRelation =>
          val p = u.multipartIdentifier
          val q =
            if (p.length == 1) (curCat +: curNs) ++ p
            else if (!cm.isCatalogRegistered(p.head)) curCat +: p
            else p
          q.map(_.toLowerCase)
      }
    val visited = scala.collection.mutable.Set.empty[Seq[String]]
    def walk(refs: Seq[Seq[String]], via: String): Unit = refs.foreach { q =>
      if (q == self)
        throw new IllegalArgumentException(
          s"recursive view: ${parts.mkString(".")} references itself " +
            s"through $via — a persisted view must not be recursive " +
            "(use a CTE with RECURSIVE inside the body instead)")
      if (visited.add(q) && q.length >= 3)
        (try cm.catalog(q.head) catch {
          case scala.util.control.NonFatal(_) => null
        }) match {
          case g: GraftCatalog =>
            g.store.lookupView(q.drop(1).dropRight(1), q.last)
              .foreach { m =>
                walk(qualifiedRefs(m.sql, m.currentCatalog,
                  m.currentNamespace), q.mkString("."))
              }
          case _ => ()
        }
    }
    walk(qualifiedRefs(body, cm.currentCatalog.name,
      cm.currentNamespace.toSeq), "its own body")
    val analyzed = s.sql(body)
    val qcols = analyzed.schema.fieldNames.toSeq
    val aliases = colList.map(_.split(',').toSeq
      .map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty)).getOrElse(Nil)
    if (aliases.nonEmpty && aliases.length != qcols.length)
      throw new IllegalArgumentException(
        s"CREATE VIEW ${parts.mkString(".")}: ${aliases.length} column " +
          s"aliases for a ${qcols.length}-column query")
    val schema =
      if (aliases.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(aliases).map {
        case (f, a) => f.copy(name = a)
      })
    val props = new java.util.HashMap[String, String]()
    propsTxt.foreach(parseProps(_).foreach { case (k, v) =>
      props.put(k, v)
    })
    // Portability lint (r19): a body that names a CATALOG explicitly
    // bakes session configuration into a persisted definition —
    // catalog names are per-session registrations, so the view breaks
    // the moment a second process registers the same warehouse under
    // another name (the multiprocess spec documents the hazard).
    // Unqualified names are the portable form: they re-anchor to the
    // CREATE-time catalog+namespace wherever the view is read. CREATE
    // warns (log + a lint property the user can inspect or UNSET) and
    // proceeds — the definition is legal, just less portable.
    val catQualified = s.sessionState.sqlParser.parsePlan(body).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if u.multipartIdentifier.length >= 3 &&
            (try cm.isCatalogRegistered(u.multipartIdentifier.head)
             catch { case scala.util.control.NonFatal(_) => false }) =>
        u.multipartIdentifier.mkString(".")
    }.distinct
    lastPortabilityLint =
      if (catQualified.isEmpty) None
      else Some((parts.mkString("."), catQualified))
    if (catQualified.nonEmpty &&
        s.conf.getOption("spark.graft.views.portability")
          .contains("strict"))
      throw new IllegalArgumentException(
        s"CREATE VIEW ${parts.mkString(".")}: the body names " +
          s"catalog-qualified table(s) ${catQualified.mkString(", ")} " +
          "and spark.graft.views.portability=strict refuses them — " +
          "catalog names are session configuration; USE the catalog " +
          "and reference tables unqualified (they re-anchor to the " +
          "CREATE-time catalog and namespace wherever the view is read)")
    if (catQualified.nonEmpty) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"CREATE VIEW ${parts.mkString(".")}: the body names " +
          s"catalog-qualified table(s) ${catQualified.mkString(", ")} — " +
          "catalog names are session configuration, so this view breaks " +
          "where the catalog is registered under another name; prefer " +
          "unqualified names (they re-anchor to the CREATE-time " +
          "catalog and namespace wherever the view is read)")
    }
    val info = new ViewInfo(ident, body, cm.currentCatalog.name,
      cm.currentNamespace, schema, qcols.toArray, aliases.toArray,
      Array.fill[String](aliases.length)(null), props)
    if (requireExists) cat.replaceView(info, false)
    else if (orReplace) cat.replaceView(info, true)
    else cat.createView(info)
    ()
  }
}

/** COPY INTO's format readers: one plan per format that conforms the
  * landing files to the table schema BY NAME, loudly.
  *
  * Shared rules across formats: a source column the table lacks
  * refuses; a table column the source lacks refuses UNLESS it is
  * fill-managed (identity / GENERATED ALWAYS — the write's fill recipe
  * populates it, so it is injected here as a typed NULL for the fill
  * to replace; requiring it would make such tables un-COPY-able, and
  * carrying an explicit value is refused by the fill path itself).
  *
  * Type conformance is format-shaped: PARQUET is already typed, so
  * only LOSSLESS upcasts apply (a permissive cast would turn drift
  * into silent NULLs); CSV carries no types at all — header names
  * resolve the columns (the reference's own CSV ingestion is header
  * promotion + explicit typing) and the values parse straight into the
  * table's types under FAILFAST, so a malformed cell dies loudly;
  * JSON is self-describing per row — one inference pass over the
  * pending files (the price of loud drift detection) resolves names
  * and checks the inferred types are losslessly readable as the
  * table's, then the typed FAILFAST read parses the matched fields. */
private[sources] object GraftCopyReader {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.types.{DateType, NullType, StringType, StructField, TimestampType}

  def conform(sp: SparkSession, format: String, paths: Seq[String],
              schema: StructType): DataFrame = {
    val fillManaged: Set[String] = schema.fields.iterator.filter { f =>
      f.metadata.contains(GraftFill.IdentityKey) ||
        f.metadata.contains(GraftFill.GeneratedKey)
    }.map(_.name).toSet

    def checkExtra(srcCols: Seq[String]): Unit = {
      val extra = srcCols.filterNot(c =>
        schema.fieldNames.exists(_.equalsIgnoreCase(c)))
      if (extra.nonEmpty)
        throw new IllegalArgumentException(
          s"COPY INTO: source carries columns the table lacks: " +
            s"${extra.mkString(", ")}")
    }

    /** Table-ordered projection: source spelling in, table names out;
      * absent fill-managed columns arrive as typed NULLs (identity
      * mints, GENERATED recomputes — both treat NULL as "fill me"). */
    def project(src: DataFrame, cast: Boolean): DataFrame = {
      val cols = schema.fields.map { f =>
        src.columns.find(_.equalsIgnoreCase(f.name)) match {
          case Some(srcName) =>
            (if (cast) col(srcName).cast(f.dataType) else col(srcName))
              .as(f.name)
          case None if fillManaged(f.name) =>
            lit(null).cast(f.dataType).as(f.name)
          case None =>
            throw new IllegalArgumentException(
              s"COPY INTO: source is missing column ${f.name}")
        }
      }
      src.select(cols.toSeq: _*)
    }

    def targetFieldOf(srcName: String): StructField =
      schema.fields.find(_.name.equalsIgnoreCase(srcName)).get

    format match {
      case "PARQUET" =>
        val src = sp.read.parquet(paths: _*)
        checkExtra(src.columns.toSeq)
        schema.fields.foreach { f =>
          src.columns.find(_.equalsIgnoreCase(f.name)).foreach { srcName =>
            val srcType = src.schema(srcName).dataType
            if (srcType != f.dataType && !Cast.canUpCast(srcType, f.dataType))
              throw new IllegalArgumentException(
                s"COPY INTO: column ${f.name} is $srcType in the " +
                  s"source but ${f.dataType} in the table — only " +
                  "lossless upcasts are applied implicitly")
          }
        }
        project(src, cast = true)

      case "CSV" =>
        // the header probe parses only the first file's header line
        // (no inferSchema — every column arrives as its name, typing
        // comes from the table below)
        val header = sp.read.option("header", "true")
          .csv(paths: _*).columns.toSeq
        checkExtra(header)
        // read schema in SOURCE header order with TARGET types;
        // enforceSchema=false validates EVERY file's header against it
        // (a drifted file hiding in the batch refuses instead of
        // reading shifted columns), FAILFAST refuses malformed cells
        val readSchema = StructType(header.map(c =>
          StructField(c, targetFieldOf(c).dataType, nullable = true)))
        val src = sp.read
          .option("header", "true")
          .option("enforceSchema", "false")
          .option("mode", "FAILFAST")
          .schema(readSchema)
          .csv(paths: _*)
        project(src, cast = false)

      case "JSON" =>
        val inferred = sp.read.json(paths: _*).schema
        if (inferred.fieldNames.contains("_corrupt_record"))
          throw new IllegalArgumentException(
            "COPY INTO: the JSON source contains malformed records")
        checkExtra(inferred.fieldNames.toSeq)
        // inferred-vs-table type gate: equal, lossless upcast, all-null
        // (NullType parses into anything), or a string field feeding a
        // DATE/TIMESTAMP column (the JSON parser parses those literals
        // under the typed read; FAILFAST catches the unparseable)
        inferred.fields.foreach { sf =>
          val f = targetFieldOf(sf.name)
          val ok = sf.dataType == f.dataType ||
            sf.dataType == NullType ||
            Cast.canUpCast(sf.dataType, f.dataType) ||
            (sf.dataType == StringType &&
              (f.dataType == DateType || f.dataType == TimestampType))
          if (!ok)
            throw new IllegalArgumentException(
              s"COPY INTO: column ${f.name} is ${sf.dataType} in the " +
                s"source but ${f.dataType} in the table — only " +
                "lossless upcasts are applied implicitly")
        }
        val readSchema = StructType(inferred.fields.map(sf =>
          StructField(sf.name, targetFieldOf(sf.name).dataType,
            nullable = true)).toSeq)
        val src = sp.read
          .option("mode", "FAILFAST")
          .schema(readSchema)
          .json(paths: _*)
        project(src, cast = false)

      case other =>
        throw new UnsupportedOperationException(
          s"COPY INTO: FILEFORMAT $other is not supported " +
            "(PARQUET, CSV or JSON)")
    }
  }
}
