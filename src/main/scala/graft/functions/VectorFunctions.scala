package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built on
  * Spark's array higher-order functions (codegen-interpreted, no UDF, no
  * driver round-trip). Floats are widened to double before any arithmetic:
  * float×float in double is exact, and the left-to-right fold order matches
  * the DuckDB oracle's `list_reduce`, so cosine values are bit-identical
  * across engines (fold seed 0.0 + x ≡ x exactly in IEEE).
  */
object VectorFunctions {

  /** array<float> → array<double>. */
  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  /** Σ aᵢ·bᵢ over two double arrays, left-to-right accumulation. Backed by
    * the codegen-native [[graft.plans.DotProduct]] expression (sessions
    * register via `GraftFunctions.registerAll`); [[dotHof]] is the
    * pure-built-in formulation kept for cross-validation. */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.vecDot(a, b)

  /** Reference formulation via array higher-order functions — identical
    * values (same accumulation order), interpreted inner loop. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

/** DuckDB twins (same index order, same fold order). Expressions expect a
  * DOUBLE[]-typed column name.
  *
  * Edge-case caveat: this `dot` iterates `a`'s indices, so a LONGER `b`
  * yields a partial dot where the Spark `vec_dot` (zip_with-pad null
  * algebra) yields NULL. Every oracle-gated query dots equal-length
  * vectors, where the twins agree exactly; a future query mixing lengths
  * must align them first (or the compare will catch it). */
object VectorSql {
  def dot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x, y) -> x + y)"

  def norm(a: String): String = s"sqrt(${dot(a, a)})"

  def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (${norm(a)} * ${norm(b)})"
}
