package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  /** Static hot loop — referenced by both eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.dot($a, $b)")
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
  }

  def wavMeta(c: Column): Column = call_function(WavHeaderExpr.FnName, c)

  def vecDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** k largest values of `c` per group, descending (native bounded-heap
    * aggregate — see [[TopKDoubles]]). */
  def topK(c: Column, k: Int): Column =
    call_function(TopKName, c, org.apache.spark.sql.functions.lit(k))
}
