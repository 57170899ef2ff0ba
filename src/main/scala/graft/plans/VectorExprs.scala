package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen-native dense-vector dot product over two `array<double>`
  * columns. Same left-to-right accumulation order as the
  * `aggregate(zip_with(...))` built-in formulation (and the DuckDB
  * oracle's `list_reduce`), so results are bit-identical — but the inner
  * loop is primitive double arithmetic over ArrayData instead of an
  * interpreted expression tree per element: the hot path of brute-force
  * and bucketed similarity search.
  */
object VectorOps {
  /** Static hot loop — referenced by both eval and generated code.
    * Precondition (checked by the caller, not here): equal lengths, no
    * null elements. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Null-algebra variant for inputs whose element type may contain
    * nulls per schema (parquet array elements usually do, even when no
    * null ever occurs): any null element (or a length mismatch — zip_with
    * pads the shorter side with nulls) makes the whole product NULL,
    * exactly like `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`.
    * Single fused pass — the null test is two bitset probes per element,
    * so the no-null common case stays near the unguarded loop's cost. */
  def dotNullable(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Declared input types: int/float arrays coerce to double arrays at
    * analysis instead of getDouble() silently misreading 4-byte element
    * data at runtime. (Type left inferred — AbstractDataType is
    * private[sql].) */
  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(DoubleType))

  /** Schema-level proof that no element can be null: primitive codegen
    * with only the length guard. Parquet array elements are declared
    * nullable, so PRODUCTION inputs take the guarded single-pass loop
    * (two bitset probes per element + one box per call — measured in the
    * same envelope as the unguarded loop); this fast path fires for
    * proven-non-null schemas only. Plan-time constant — lazy val so the
    * interpreted eval path doesn't re-derive it per row. */
  @transient private lazy val provedNullFree: Boolean =
    Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, containsNull) => !containsNull
      case _ => false
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (provedNullFree) {
      if (aa.numElements() != bb.numElements()) null
      else VectorOps.dot(aa, bb)
    } else VectorOps.dotNullable(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = left.genCode(ctx)
    val rb = right.genCode(ctx)
    if (provedNullFree) {
      val code =
        code"""
          ${la.code}
          ${rb.code}
          boolean ${ev.isNull} = ${la.isNull} || ${rb.isNull} ||
            ${la.value}.numElements() != ${rb.value}.numElements();
          double ${ev.value} = ${ev.isNull}
            ? -1.0 : graft.plans.VectorOps.dot(${la.value}, ${rb.value});
        """
      ev.copy(code = code)
    } else {
      val boxed = ctx.freshName("dotBoxed")
      val code =
        code"""
          ${la.code}
          ${rb.code}
          boolean ${ev.isNull} = ${la.isNull} || ${rb.isNull};
          double ${ev.value} = -1.0;
          if (!${ev.isNull}) {
            java.lang.Double $boxed =
              graft.plans.VectorOps.dotNullable(${la.value}, ${rb.value});
            if ($boxed == null) { ${ev.isNull} = true; }
            else { ${ev.value} = $boxed.doubleValue(); }
          }
        """
      ev.copy(code = code)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** One-stop registration of every custom graft expression into a session's
  * function registry (Column access via `call_function`, plus SQL). */
object GraftFunctions {
  val DotName = "vec_dot"
  val TopKName = "topk"

  /** Plan-time extraction of a size parameter (k/n/w) that must be a
    * foldable non-null integer literal — it sizes static structures the
    * expression builds once at planning. A clear AnalysisException naming
    * the function beats the opaque ClassCastException/NPE a bare
    * `exprs(i).eval()` raises on `minhashes(sh, c)` or a NULL literal. */
  def litInt(fn: String, exprs: Seq[Expression], idx: Int, what: String): Int = {
    def fail(got: String) = throw new org.apache.spark.sql.AnalysisException(
      s"$fn: argument ${idx + 1} ($what) must be a foldable non-null " +
        s"integer literal, got $got",
      None, None, None, None, Map.empty, Array.empty)
    if (exprs.size <= idx) fail(s"${exprs.size} arguments")
    val e = exprs(idx)
    if (!e.foldable) fail(e.sql)
    e.eval() match {
      case n: Number => n.intValue
      case null => fail("NULL")
      case other => fail(s"${e.sql} (${other.getClass.getSimpleName})")
    }
  }

  def registerAll(spark: SparkSession): Unit = {
    PolyHashExpr.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    // topk(col, k): k must be a foldable literal — it sizes the agg buffer
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName,
      exprs => TopKDoubles(exprs.head, litInt(TopKName, exprs, 1, "k"))
        .toAggregateExpression(),
      "built-in")
    // minhashes(arr, k): k must be a foldable literal — it sizes the
    // prefix-hash table
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashExpr.FnName,
      exprs => MinHashes(exprs.head, litInt(MinHashExpr.FnName, exprs, 1, "k")),
      "built-in")
    // shingle_minhash(toks, n): n must be a foldable literal
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleMinHashExpr.FnName,
      exprs => ShingleMinHash(exprs.head,
        litInt(ShingleMinHashExpr.FnName, exprs, 1, "n")),
      "built-in")
    // winnow_fingerprints(toks, n, w): n, w must be foldable literals
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowExpr.FnName,
      exprs => Winnow(exprs.head,
        litInt(WinnowExpr.FnName, exprs, 1, "n"),
        litInt(WinnowExpr.FnName, exprs, 2, "w")),
      "built-in")
    // wav_meta(binary): RIFF/WAVE header parse
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WavHeaderExpr.FnName, exprs => WavMeta(exprs.head), "built-in")
    // png_meta(binary): PNG container parse
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PngHeaderExpr.FnName, exprs => PngMeta(exprs.head), "built-in")
    // avi_meta(binary): RIFF/AVI container parse
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AviHeaderExpr.FnName, exprs => AviMeta(exprs.head), "built-in")
  }

  def wavMeta(c: Column): Column = call_function(WavHeaderExpr.FnName, c)

  def pngMeta(c: Column): Column = call_function(PngHeaderExpr.FnName, c)

  def aviMeta(c: Column): Column = call_function(AviHeaderExpr.FnName, c)

  def vecDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** k largest values of `c` per group, descending (native bounded-heap
    * aggregate — see [[TopKDoubles]]). */
  def topK(c: Column, k: Int): Column =
    call_function(TopKName, c, org.apache.spark.sql.functions.lit(k))
}
