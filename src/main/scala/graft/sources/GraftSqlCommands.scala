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
  *   OPTIMIZE t [ZORDER BY (col [, col…])] [TARGET n ROWS]
  *   VACUUM t [RETAIN n SNAPSHOTS]
  *   RESTORE TABLE t TO VERSION AS OF v
  * }}} */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(
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
    """(?is)\s*OPTIMIZE\s+([\w.`]+?)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?(?:\s+TARGET\s+(\d+)\s+ROWS)?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`]+?)(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.`]+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r

  /** Identifier parts, or None for an unqualified single-part name —
    * those DELEGATE to Spark's parser (another extension may own the
    * statement; this one never hijacks what it cannot resolve). */
  private def split(ident: String): Option[Seq[String]] = {
    val parts = ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    if (parts.length >= 2) Some(parts) else None
  }

  /** Resolve parts to a store key AT RUN TIME: a 3+-part name tries the
    * catalog-stripped key first, then the full parts as a nested
    * namespace — the JVM-global store is the same table universe under
    * every registered graft catalog name, so existence disambiguates. */
  private def resolve(parts: Seq[String]): (Seq[String], String) = {
    val cands =
      (if (parts.length >= 3)
        Seq((parts.tail.dropRight(1), parts.last)) else Nil) :+
      ((parts.dropRight(1), parts.last))
    cands.find(GraftTableStore.tables.contains).getOrElse(cands.head)
  }

  private def out(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, IntegerType, nullable = false)())

  /** Some(command plan) when `sqlText` is a maintenance statement over a
    * qualified table name. */
  def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Optimize(ident, zcols, target) =>
        split(ident).map { parts =>
          val rows = Option(target).map(_.toInt).getOrElse(1 << 20)
          GraftMaintenanceCommand(
            out("files_before", "files_after"), _ => {
              val (ns, t) = resolve(parts)
              val r =
                if (zcols == null) GraftMaintenance.optimize(ns, t, rows)
                else GraftMaintenance.zorderBy(ns, t,
                  zcols.split(',').toSeq.map(_.trim.stripPrefix("`")
                    .stripSuffix("`")).filter(_.nonEmpty), rows)
              Seq(Row(r.filesBefore, r.filesAfter))
            })
        }
      case Vacuum(ident, keep) =>
        split(ident).map { parts =>
          val keepLast = Option(keep).map(_.toInt).getOrElse(1)
          GraftMaintenanceCommand(out("snapshots_retired"), _ => {
            val (ns, t) = resolve(parts)
            Seq(Row(GraftMaintenance.vacuum(ns, t, keepLast)))
          })
        }
      case Restore(ident, v) =>
        split(ident).map { parts =>
          GraftMaintenanceCommand(out("restored_to_version"), _ => {
            val (ns, t) = resolve(parts)
            GraftMaintenance.restore(ns, t, v.toInt)
            Seq(Row(v.toInt))
          })
        }
      case _ => None
    }
}

/** A parsed maintenance statement: runs driver-side at execution (the
  * ops are metadata/log work), emitting its census as the result rows. */
case class GraftMaintenanceCommand(
    override val output: Seq[Attribute],
    body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
}
