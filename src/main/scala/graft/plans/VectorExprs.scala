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

  def registerAll(spark: SparkSession): Unit = {
    PolyHashExpr.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    // topk(col, k): k must be a foldable literal — it sizes the agg buffer
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName,
      exprs => TopKDoubles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)
        .toAggregateExpression(),
      "built-in")
    // minhashes(arr, k): k must be a foldable literal — it sizes the
    // prefix-hash table
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashExpr.FnName,
      exprs => MinHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue),
      "built-in")
    // shingle_minhash(toks, n): n must be a foldable literal
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleMinHashExpr.FnName,
      exprs => ShingleMinHash(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue),
      "built-in")
    // winnow_fingerprints(toks, n, w): n, w must be foldable literals
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowExpr.FnName,
      exprs => Winnow(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue,
        exprs(2).eval().asInstanceOf[Number].intValue),
      "built-in")
  }

  def vecDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** k largest values of `c` per group, descending (native bounded-heap
    * aggregate — see [[TopKDoubles]]). */
  def topK(c: Column, k: Int): Column =
    call_function(TopKName, c, org.apache.spark.sql.functions.lit(k))
}
