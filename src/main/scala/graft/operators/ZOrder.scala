package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering + zone-map data skipping — the
  * lakehouse layout optimizer (Delta/Iceberg `OPTIMIZE ZORDER BY`) done
  * Spark-native. The reference's platform exposes this through Delta;
  * here the mechanism itself is the operator: map each clustering column
  * to an order-preserving integer bin, interleave the bin bits into a
  * Morton code, and lay files out along the curve. A file then covers a
  * RECTANGLE in (x, y) space instead of a stripe, so its min/max zone
  * map prunes on BOTH dimensions — the reason a 2-D-selective query
  * scans a few files of a z-ordered 100 TB table but a full stripe of a
  * linearly sorted one.
  *
  * Everything is exact integer arithmetic (bins from min/max integer
  * division, bit spread via mask-and-shift), so the whole layout — codes,
  * file assignment, zone maps, and the skip census — is reproducible
  * cross-engine and sits under the DuckDB oracle (s31).
  */
object ZOrder {

  /** Spread the low 4 bits of `b` to even positions: b3b2b1b0 →
    * 0b3 0b2 0b1 0b0 (bit i → bit 2i). */
  def spread4(b: Column): Column =
    b.bitwiseAND(lit(1L))
      .bitwiseOR(shiftleft(b.bitwiseAND(lit(2L)), 1))
      .bitwiseOR(shiftleft(b.bitwiseAND(lit(4L)), 2))
      .bitwiseOR(shiftleft(b.bitwiseAND(lit(8L)), 3))

  /** Oracle twin of [[spread4]] (one definition pair — same mask/shift
    * algebra as SQL text). */
  def spread4Sql(e: String): String =
    s"(($e & 1) | (($e & 2) << 1) | (($e & 4) << 2) | (($e & 8) << 3))"

  /** Morton code of two 4-bit bins: x bits on even positions, y on odd —
    * adjacent codes are adjacent cells on the space-filling curve. */
  def morton(bx: Column, by: Column): Column =
    spread4(bx).bitwiseOR(shiftleft(spread4(by), 1))

  def mortonSql(bx: String, by: String): String =
    s"(${spread4Sql(bx)} | (${spread4Sql(by)} << 1))"

  /** Exact integer floor division for non-negative operands: Spark's `/`
    * is double division, so divide only after subtracting the remainder —
    * the quotient of exact multiples is exact at any magnitude the double
    * mantissa holds. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Order-preserving 16-bin quantization of an integer column over its
    * [min, max] range: floor((x−min)·16 / (range+1)) ∈ [0, 15] — exact
    * integer division, identical in any engine. */
  def bin16(x: Column, minV: Column, maxV: Column): Column =
    idiv((x - minV) * 16, maxV - minV + 1)

  def bin16Sql(x: String, minV: String, maxV: String): String =
    s"(($x - $minV) * 16) // ($maxV - $minV + 1)"
}
