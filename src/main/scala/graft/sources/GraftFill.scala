package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Column
import org.apache.spark.sql.types._

/** Write-time column FILL: identity columns (`GENERATED ALWAYS AS
  * IDENTITY`) and generated columns (`GENERATED ALWAYS AS (expr)`).
  * Spark's analyzer admits the DDL once the catalog declares the
  * capabilities, but value generation is the CONNECTOR's job (the
  * Delta model): the fill runs INSIDE the writer task, per row, before
  * validation — executor-side on durable tables, so a 100 TB insert
  * generates its ids where its rows are.
  *
  * Identity values are allocated Delta-style, optimistically: the
  * write reserves a VALUE BLOCK off the table's persisted high-water
  * at plan time ([[GraftTable]] reads it from the same per-table
  * ledger the streaming sink and txn writers ride), tasks mint
  * `base + step·(partitionId·2²⁴ + rowIdx)` — unique within the block,
  * gaps allowed (the SQL identity contract) — and the COMMIT, under
  * the table lease, verifies no concurrent writer advanced the
  * high-water past the reserved base (abort-and-retry otherwise,
  * Delta's conflict shape) before publishing `base + blockSpan`. */
object GraftFill {
  /** StructField metadata key of an identity column:
    * "start,step,allowExplicit". */
  val IdentityKey = "graft.identity"

  /** StructField metadata key of a generated column: the expression
    * text (compiled against the table schema by the same bounded
    * dialect compiler CHECK constraints use). */
  val GeneratedKey = "graft.generated"

  /** Ledger-key namespace of identity high-waters ("idh:<col>"):
    * max-merged on replay — exactly right for a high-water — and
    * riding every log entry, so restarts and foreign writers agree. */
  val IdentityLedgerPrefix = "idh:"

  /** Identity VALUE block one write reserves: 2⁴⁰ step-units — room
    * for 2¹⁶ partitions × 2²⁴ rows each at |step| = 1. The writer
    * guards the bounds loudly; the space allows ~8M identity-writing
    * commits before Long exhaustion (documented trade, as Delta's). */
  val BlockUnits: Long = 1L << 40
  val RowsPerTaskShift: Int = 24

  /** Compile a DSv2 Column[] (the CREATE TABLE shape that carries
    * identity specs and generation expressions) into a StructType whose
    * field metadata preserves them — the schema already persists in the
    * log and ships to executor writers, so the specs reach every fill
    * site with zero extra plumbing. */
  def schemaFromColumns(columns: Array[Column]): StructType =
    StructType(columns.map { c =>
      var md = new MetadataBuilder()
      Option(c.comment()).foreach(md.putString("comment", _))
      Option(c.identityColumnSpec()).foreach { spec =>
        // BIGINT only (the Delta rule): each committed write reserves a
        // 2⁴⁰-unit value block, so an INT column's range is exhausted
        // by the SECOND write's reservation — accepting INT here would
        // mean a table that takes exactly one successful insert
        if (c.dataType != LongType)
          throw new UnsupportedOperationException(
            s"identity column ${c.name()}: BIGINT only — the reserved " +
              s"per-write value blocks (2^40 units) exceed the range of " +
              s"${c.dataType}")
        // the high-water ledger is max-merged on replay — sound only
        // for ASCENDING sequences
        if (spec.getStep <= 0)
          throw new UnsupportedOperationException(
            s"identity column ${c.name()}: step must be positive " +
              s"(got ${spec.getStep}) — the persisted high-water is " +
              "an ascending watermark")
        md.putString(IdentityKey,
          s"${spec.getStart},${spec.getStep},${spec.isAllowExplicitInsert}")
      }
      Option(c.generationExpression()).foreach { expr =>
        md.putString(GeneratedKey, expr)
      }
      if (c.defaultValue() != null)
        // Spark resolves CURRENT_DEFAULT itself; preserve its metadata
        // encoding via the standard conversion key
        md.putString("CURRENT_DEFAULT", c.defaultValue().getSql)
      StructField(c.name(), c.dataType(), c.nullable(), md.build())
    })

  final case class IdentityFill(ord: Int, name: String, start: Long,
                                step: Long, allowExplicit: Boolean)
  final case class GeneratedFill(ord: Int, name: String,
                                 check: GraftConstraints.Check)

  def identityCols(schema: StructType): Seq[IdentityFill] =
    schema.fields.toSeq.zipWithIndex.collect {
      case (f, i) if f.metadata.contains(IdentityKey) =>
        val Array(st, sp, ae) = f.metadata.getString(IdentityKey).split(',')
        IdentityFill(i, f.name, st.toLong, sp.toLong, ae.toBoolean)
    }

  def generatedCols(schema: StructType): Seq[GeneratedFill] =
    schema.fields.toSeq.zipWithIndex.collect {
      case (f, i) if f.metadata.contains(GeneratedKey) =>
        val txt = f.metadata.getString(GeneratedKey)
        val chk = GraftConstraints.compileExpr(txt, schema)
        // a generation expression referencing another generated/identity
        // column would see unfilled NULLs — refuse the cycle at create
        chk.expr.foreach {
          case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
            val rf = schema.fields(b.ordinal)
            if (rf.metadata.contains(GeneratedKey) ||
                rf.metadata.contains(IdentityKey))
              throw new UnsupportedOperationException(
                s"generated column ${f.name}: expression may not " +
                  s"reference generated/identity column ${rf.name}")
          case _ => ()
        }
        GeneratedFill(i, f.name, chk)
    }
}

/** The serializable per-write fill recipe (ships inside the writer
  * factory). `identityBases` align with [[identities]]: the VALUE each
  * write's block starts at. */
final case class GraftFillSpec(
    schemaJson: String,
    identities: Seq[GraftFill.IdentityFill],
    identityBases: Seq[Long],
    generated: Seq[GraftFill.GeneratedFill],
    rowLevel: Boolean = false) extends Serializable {

  @transient lazy val schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** Fill one incoming row (task-side). Returns a NEW row when any
    * column fills; the input row otherwise.
    *
    * `rowLevel` is the ROW-LEVEL-WRITE mode: MERGE/UPDATE rewrites
    * deliver a mix of CARRIED rows (identity values already present —
    * pass through, no ALWAYS refusal: the writer cannot distinguish a
    * carried value from an explicit one, so the ALWAYS contract is
    * enforced on the plain insert path) and merge-INSERTED rows (the
    * identity target arrives NULL — mint from this rewrite's own
    * reserved block, same math as the plain path). GENERATED columns
    * RECOMPUTE on delivery for every row — Delta's semantics: an
    * UPDATE that touches a generation source must not leave the
    * derived column stale, and recomputing unconditionally (the
    * expression is deterministic over this row) also keeps the column
    * contract when a merge clause supplied an inconsistent value. */
  def fill(row: InternalRow, partitionId: Int, localIdx: Long)
      : InternalRow = {
    val s = schema
    var out: GenericInternalRow = null
    def materialize(): GenericInternalRow = {
      if (out == null) {
        val vals = new Array[Any](s.length)
        var i = 0
        while (i < s.length) {
          vals(i) = if (row.isNullAt(i)) null
                    else row.get(i, s.fields(i).dataType)
          i += 1
        }
        out = new GenericInternalRow(vals)
      }
      out
    }
    identities.zip(identityBases).foreach { case (id, base) =>
      if (!row.isNullAt(id.ord)) {
        if (!id.allowExplicit && !rowLevel)
          throw new IllegalStateException(
            s"identity column ${id.name} is GENERATED ALWAYS — explicit " +
              "values are not accepted (BY DEFAULT allows them)")
      } else {
        val offset = (partitionId.toLong << GraftFill.RowsPerTaskShift) +
          localIdx
        if (localIdx >= (1L << GraftFill.RowsPerTaskShift) ||
            offset >= GraftFill.BlockUnits / math.max(1L, math.abs(id.step)))
          throw new IllegalStateException(
            s"identity column ${id.name}: write exceeds the reserved " +
              s"value block (partition $partitionId, row $localIdx, " +
              s"step ${id.step}) — split the write")
        val v = base + id.step * offset
        // CREATE refuses non-BIGINT identity since r14, but a table
        // created before that rule can carry an INT identity column —
        // a boxed Long in an IntegerType slot would CCE at segment
        // write, so keep a guarded downcast with a clear overflow error
        val slot: Any = s.fields(id.ord).dataType match {
          case IntegerType =>
            if (v > Int.MaxValue || v < Int.MinValue)
              throw new IllegalStateException(
                s"identity column ${id.name}: minted value $v overflows " +
                  "its legacy INT type — the per-write value blocks " +
                  "exhaust an INT's range; migrate the column to BIGINT")
            java.lang.Integer.valueOf(v.toInt)
          case _ => java.lang.Long.valueOf(v)
        }
        materialize().update(id.ord, slot)
      }
    }
    generated.foreach { g =>
      if (!rowLevel && !row.isNullAt(g.ord))
        throw new IllegalStateException(
          s"column ${g.name} is GENERATED ALWAYS AS (${g.check.text}) — " +
            "explicit values are not accepted")
      val m = materialize()
      m.update(g.ord, g.check.expr.eval(m))
    }
    if (out == null) row else out
  }
}
