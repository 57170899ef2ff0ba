package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData

/** Codegen-native winnowing fingerprint: min over all n-token windows of
  * `poly_hash(window joined by ' ')` — ONE pass over the token array, no
  * shingle strings ever materialized.
  *
  * Semantically identical to
  * `array_min(transform(shingles(toks, n), s => poly_hash(s)))` (the
  * formulation the oracles state): `array_min` is unchanged by
  * `shingles`' `array_distinct` (min over duplicates = min over
  * distinct), and each window hash is assembled from per-token partials
  * via the compositional identity
  * `H(a ++ b) = (H(a) · 31^len(b) + H(b)) mod M` — every token's bytes
  * are scanned ONCE to produce `(H(tok), 31^len(tok))`, then each window
  * costs n modular multiply-adds (the single space between tokens folds
  * in as one more step with H(" ") = 32, 31^1 = 31). All intermediate
  * products stay below 2^62, so the arithmetic is exact — bit-equal to
  * the string-materializing formulation, which FunctionsSpec pins.
  *
  * This is the fingerprint hot loop of t8/t30 (and any winnowing-style
  * near-dup keying) — the HOF version allocates a UTF8String per shingle
  * per window and walks an interpreted tree per character; this walks
  * primitive longs.
  */
object ShingleMinHashExpr {
  val Mod: Long = PolyHashExpr.Mod

  val FnName = "shingle_minhash"

  /** Static hot loop — referenced by both eval and generated code.
    * Returns null (boxed) for arrays with fewer than n tokens, matching
    * `array_min` over an empty shingle array. NULL tokens follow the HOF
    * formulation's null algebra: a window containing a NULL token hashes
    * to NULL (concat propagates it), which `array_min` ignores — so such
    * windows are skipped, and null is returned if no window survives. */
  def minShingleHash(arr: ArrayData, n: Int): java.lang.Long = {
    val cnt = arr.numElements()
    if (cnt < n) return null
    // per-token partials: h(i) = H(tok_i), p(i) = 31^len(tok_i) mod M
    val h = new Array[Long](cnt)
    val p = new Array[Long](cnt)
    var anyNull = false
    var i = 0
    while (i < cnt) {
      if (arr.isNullAt(i)) { anyNull = true; i += 1 }
      else {
      val bytes = arr.getUTF8String(i).getBytes
      var hh = 0L
      var pp = 1L
      var j = 0
      while (j < bytes.length) {
        hh = (hh * 31 + (bytes(j) & 0xff)) % Mod
        pp = (pp * 31) % Mod
        j += 1
      }
      h(i) = hh
      p(i) = pp
      i += 1
      }
    }
    var min = Long.MaxValue
    var s = 0
    while (s <= cnt - n) {
      // fold tokens s..s+n-1 with a single space (byte 32) between each,
      // skipping windows that contain a null token
      if (!anyNull || lastNullBefore(arr, s, n) < 0) {
        var acc = h(s)
        var k = s + 1
        while (k < s + n) {
          acc = (acc * 31 + 32) % Mod          // append ' '
          acc = (acc * p(k) + h(k)) % Mod      // append tok_k
          k += 1
        }
        if (acc < min) min = acc
      }
      s += 1
    }
    if (min == Long.MaxValue) null else java.lang.Long.valueOf(min)
  }

  /** Index of a null token inside window [s, s+n), or -1 (rare path —
    * only consulted when the array has at least one null element). */
  private def lastNullBefore(arr: ArrayData, s: Int, n: Int): Int = {
    var k = s
    while (k < s + n) {
      if (arr.isNullAt(k)) return k
      k += 1
    }
    -1
  }
}

/** `shingle_minhash(toks, n)` — n must be a foldable literal. */
case class ShingleMinHash(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleMinHashExpr.minShingleHash(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the static helper returns a boxed Long (null = "no window"), so the
    // generated code must branch on it rather than unbox blindly
    val input = child.genCode(ctx)
    val boxed = ctx.freshName("boxedShmh")
    val code =
      code"""
        ${input.code}
        boolean ${ev.isNull} = ${input.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          java.lang.Long $boxed =
            graft.plans.ShingleMinHashExpr.minShingleHash(${input.value}, $n);
          if ($boxed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $boxed.longValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}
