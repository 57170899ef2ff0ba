package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-native polynomial rolling hash:
  * `acc = (acc*31 + byte) mod 1e9+7` folded over the UTF-8 bytes.
  *
  * Semantically equal to the composable-built-in formulation
  * `aggregate(transform(split(s,''), ascii), 0, …)` for ASCII input, but
  * ~100× faster: the HOF version allocates a UTF8String per character and
  * walks an interpreted expression tree per fold step; this is a tight
  * primitive loop that whole-stage codegen inlines via a static call, so
  * the surrounding projection stays in one codegen span. This is the
  * "custom Expression where built-ins can't express it efficiently" path —
  * the hot inner loop of MinHash/SimHash/fingerprint over billions of
  * shingles at 100 TB.
  *
  * (Caveat: byte-folding equals char-folding only for ASCII; the corpus
  * and the DuckDB oracle agree on ASCII. For full Unicode parity the fold
  * would walk codepoints.)
  */
object PolyHashExpr {
  val Mod = 1000000007L

  /** Static hot loop — referenced by both eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    acc
  }

  val FnName = "poly_hash"

  /** Register `poly_hash` into a session's function registry (the public
    * route from a custom Expression to both Column and SQL usage). Must be
    * called once per session before plans using [[column]] are analyzed —
    * Verify/Bench/tests all do. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => PolyHash(exprs.head), "built-in")

  def column(c: Column): Column = call_function(FnName, c)
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PolyHashExpr.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHashExpr.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
