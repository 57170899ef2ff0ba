package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen-native positional winnowing: the distinct minima of every
  * w-window of n-token-shingle hashes, in ONE token-array pass.
  *
  * Semantically equal (as a SET — callers explode and re-sort) to the
  * HOF formulation
  * `array_distinct(transform(sequence(0, len(hs)-w), j ->
  * array_min(slice(hs, j+1, w))))` over positional shingle hashes `hs`,
  * with the same short-input edges: fewer than n tokens → empty, fewer
  * than w shingles → the single global min. The shingle hashes come from
  * the [[ShingleMinHashExpr]] per-token (hash, power) partials, and the
  * window minima from a monotonic-deque sliding minimum — O(len) total
  * instead of O(len·w) slice allocations; returned ascending so the
  * output is deterministic independent of hash-set iteration order.
  */
object WinnowExpr {
  val Mod: Long = PolyHashExpr.Mod

  val FnName = "winnow_fingerprints"

  /** Static hot loop — referenced by both eval and generated code.
    * NULL tokens (rare, SQL-route only — in-repo tokenizers never emit
    * them) follow the HOF null algebra: a shingle containing a NULL token
    * hashes to NULL and is dropped before windowing; winnowing then runs
    * over the surviving shingle-hash sequence. */
  def winnow(arr: ArrayData, n: Int, w: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    // per-token partials, then positional shingle hashes (no distinct)
    val h = new Array[Long](cnt)
    val p = new Array[Long](cnt)
    var anyNull = false
    var i = 0
    while (i < cnt) {
      if (arr.isNullAt(i)) { anyNull = true; i += 1 }
      else {
      val bytes = arr.getUTF8String(i).getBytes
      var hh = 0L; var pp = 1L; var j = 0
      while (j < bytes.length) {
        hh = (hh * 31 + (bytes(j) & 0xff)) % Mod
        pp = (pp * 31) % Mod
        j += 1
      }
      h(i) = hh; p(i) = pp; i += 1
      }
    }
    var nh = cnt - n + 1
    var hs = new Array[Long](nh)
    var valid = 0
    var s = 0
    while (s < nh) {
      var hasNull = false
      if (anyNull) {
        var q = s
        while (q < s + n && !hasNull) { hasNull = arr.isNullAt(q); q += 1 }
      }
      if (!hasNull) {
        var acc = h(s)
        var k = s + 1
        while (k < s + n) {
          acc = (acc * 31 + 32) % Mod
          acc = (acc * p(k) + h(k)) % Mod
          k += 1
        }
        hs(valid) = acc; valid += 1
      }
      s += 1
    }
    nh = valid
    if (nh == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nh < w) {
      var min = Long.MaxValue
      var t = 0
      while (t < nh) { if (hs(t) < min) min = hs(t); t += 1 }
      out.add(min)
    } else {
      // monotonic deque of indices: front is the current window's min
      val dq = new Array[Int](nh)
      var head = 0; var tail = 0 // dq[head until tail]
      var t = 0
      while (t < nh) {
        while (tail > head && hs(dq(tail - 1)) >= hs(t)) tail -= 1
        dq(tail) = t; tail += 1
        if (dq(head) <= t - w) head += 1
        if (t >= w - 1) out.add(hs(dq(head)))
        t += 1
      }
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

/** `winnow_fingerprints(toks, n, w)` — n and w must be foldable literals. */
case class Winnow(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.winnow(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowExpr.winnow($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
