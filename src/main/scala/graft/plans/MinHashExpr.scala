package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-native k-permutation MinHash over a shingle array — ONE pass.
  *
  * Semantically identical to the composable formulation
  * `array((0 until k).map(p => array_min(transform(shingles, s =>
  * poly_hash(concat(lit(s"$p|"), s))))))` — the per-permutation "hash of
  * the prefixed shingle" family t5/t24's oracles state in SQL — but it
  * walks the shingle array ONCE instead of k times and hashes each
  * shingle's bytes ONCE instead of k times.
  *
  * The algebra that makes the fusion exact: the polynomial fold is
  * compositional, `H(a ++ b) = (H(a) · 31^len(b) + H(b)) mod M`, so for a
  * fixed permutation prefix `p|` the prefixed hash is
  * `(H("p|") · 31^len(s) + H(s)) mod M` — one byte-scan of `s` yields
  * `H(s)` and `31^len(s) mod M` together, and each permutation then costs
  * one multiply-add against its precomputed prefix hash. All intermediate
  * products stay below 2^62 (both factors < M ≈ 2^30), so the modular
  * arithmetic is exact in a long — bit-equal to the k-scan formulation,
  * which FunctionsSpec pins.
  *
  * Null/empty semantics match `array_min` over `transform`: a NULL shingle
  * array yields NULL (nullSafeEval), an EMPTY one yields k NULL elements —
  * the "no signature" marker the band joins already treat as non-joining.
  *
  * At 100 TB the signature pass dominates MinHash-LSH dedup cost (the band
  * join only sees colliding buckets); this turns its inner loop from
  * k × (interpreted HOF tree + per-char UTF8String allocations) into one
  * tight primitive loop whole-stage codegen inlines.
  */
object MinHashExpr {
  val Mod: Long = PolyHashExpr.Mod

  val FnName = "minhashes"

  /** H(s"$p|") for p in 0 until k — the per-permutation prefix hashes. */
  def prefixHashes(k: Int): Array[Long] =
    Array.tabulate(k)(p => PolyHashExpr.hash(UTF8String.fromString(s"$p|")))

  /** Static hot loop — referenced by both eval and generated code.
    * NULL elements are skipped, matching `array_min` over `transform`
    * (poly_hash(NULL) = NULL, which array_min ignores); an array with no
    * non-null element yields k NULLs like an empty one. */
  def minhashes(arr: ArrayData, prefH: Array[Long]): ArrayData = {
    val k = prefH.length
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 }
      else {
      seen = true
      val bytes = arr.getUTF8String(i).getBytes
      var h = 0L
      var pw = 1L
      var j = 0
      while (j < bytes.length) {
        h = (h * 31 + (bytes(j) & 0xff)) % Mod
        pw = (pw * 31) % Mod
        j += 1
      }
      var p = 0
      while (p < k) {
        val v = (prefH(p) * pw + h) % Mod
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
      }
    }
    if (!seen) new GenericArrayData(new Array[Any](k))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `minhashes(shingles, k)` — k must be a foldable literal (it sizes the
  * prefix-hash table, resolved once at planning). */
case class MinHashes(child: Expression, k: Int) extends UnaryExpression {
  @transient private lazy val prefH = MinHashExpr.prefixHashes(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.minhashes(input.asInstanceOf[ArrayData], prefH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.addReferenceObj("prefH", prefH, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashExpr.minhashes($c, $ph)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}
