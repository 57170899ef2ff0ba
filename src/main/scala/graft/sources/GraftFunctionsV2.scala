package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 FUNCTION catalog entries: the engine's codegen kernels
  * (`poly_hash`, `vec_dot` — see `plans/PolyHashExpr`, `plans/VectorExprs`)
  * exposed as catalog-qualified SQL functions (`SELECT
  * graft_cat.ns.poly_hash(...)`). This is the governed route a shared
  * cluster uses: session-registry functions
  * ([[graft.plans.GraftExtensions]]) require each session to opt in,
  * while catalog functions resolve for ANY session that can see the
  * catalog — no conf, no registration call.
  *
  * Each function implements the MAGIC `invoke` method with exact
  * Catalyst-internal parameter types, so Spark plans a direct method
  * call (`Invoke`) inside whole-stage codegen instead of boxing a row
  * for `produceResult` — the same hot-loop property the session-route
  * expressions have. Arguments arrive as references (UTF8String /
  * ArrayData), so the null algebra is handled explicitly and identically
  * in both entry points. */
private[sources] object GraftFunctionsV2 {

  val all: Map[String, UnboundFunction] = Map(
    "poly_hash" -> PolyHashUnbound,
    "vec_dot" -> VecDotUnbound,
    "bucket" -> BucketUnbound)

  /** The ONE bucket kernel: write-side routing (clustered distribution),
    * group-key assignment, and the catalog `bucket` function all call
    * this, so a row's bucket is the same number everywhere — the
    * property storage-partitioned joins stand on. Content-stable hashes
    * (java.lang.Long spec'd; UTF8String's murmur-style bytes hash),
    * floor-mod into [0, n). */
  def bucketOf(n: Int, value: Any): Int = value match {
    case null => 0 // nulls cluster in bucket 0
    case l: java.lang.Long => java.lang.Math.floorMod(l.hashCode, n)
    case i: java.lang.Integer => java.lang.Math.floorMod(
      java.lang.Long.valueOf(i.longValue()).hashCode, n)
    case s: java.lang.Short => java.lang.Math.floorMod(
      java.lang.Long.valueOf(s.longValue()).hashCode, n)
    case b: java.lang.Byte => java.lang.Math.floorMod(
      java.lang.Long.valueOf(b.longValue()).hashCode, n)
    case u: UTF8String => java.lang.Math.floorMod(u.hashCode, n)
    case other => throw new UnsupportedOperationException(
      s"bucket: unsupported value type ${other.getClass.getName}")
  }

  /** Types [[bucketOf]] accepts — integral + string (all hashed through
    * a stable content hash). */
  def bucketSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col) - stable hash bucket in [0, n); the transform " +
        "function behind PARTITIONED BY bucket(n, col)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
          inputType.fields(0).dataType != IntegerType ||
          !bucketSupported(inputType.fields(1).dataType))
        throw new UnsupportedOperationException(
          s"bucket expects (int, integral-or-string column), got " +
            inputType.simpleString)
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  class BucketBound(colType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    // a NULL bucket count yields NULL (there is no bucket to name)
    override def isResultNullable: Boolean = true

    private def checked(n: Int): Int = {
      if (n <= 0) throw new IllegalArgumentException(
        s"bucket count must be positive, got $n")
      n
    }

    // magic invoke overloads per supported column type — codegen calls
    // these directly (no row boxing on the write-clustering hot path);
    // a null value lands in bucket 0, matching bucketOf's contract
    // (primitive slots read 0 on null, and hash(0) floor-mods to 0 too)
    def invoke(n: Int, v: Long): Int =
      bucketOf(checked(n), java.lang.Long.valueOf(v))
    def invoke(n: Int, v: Int): Int =
      bucketOf(checked(n), java.lang.Integer.valueOf(v))
    def invoke(n: Int, v: Short): Int =
      bucketOf(checked(n), java.lang.Short.valueOf(v))
    def invoke(n: Int, v: Byte): Int =
      bucketOf(checked(n), java.lang.Byte.valueOf(v))
    def invoke(n: Int, v: UTF8String): Int = bucketOf(checked(n), v)

    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null
      else {
        val n = checked(input.getInt(0))
        val v = if (input.isNullAt(1)) null else input.get(1, colType)
        java.lang.Integer.valueOf(bucketOf(n, v))
      }
  }

  object PolyHashUnbound extends UnboundFunction {
    override def name(): String = "poly_hash"
    override def description(): String =
      "poly_hash(str) - (acc*31 + byte) mod 1e9+7 over the UTF-8 bytes"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != StringType)
        throw new UnsupportedOperationException(
          s"poly_hash expects (string), got ${inputType.simpleString}")
      new PolyHashBound
    }
  }

  class PolyHashBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def name(): String = "poly_hash"
    override def canonicalName(): String = "graft.poly_hash"
    override def isResultNullable: Boolean = true
    /** Magic method — codegen calls this directly. */
    def invoke(s: UTF8String): java.lang.Long =
      if (s == null) null
      else java.lang.Long.valueOf(graft.plans.PolyHashExpr.hash(s))
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
  }

  object VecDotUnbound extends UnboundFunction {
    override def name(): String = "vec_dot"
    override def description(): String =
      "vec_dot(a, b) - dot product of two double arrays (NULL on any " +
        "null element or length mismatch)"
    private def isDoubleArray(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
          !inputType.fields.forall(f => isDoubleArray(f.dataType)))
        throw new UnsupportedOperationException(
          s"vec_dot expects (array<double>, array<double>), got " +
            inputType.simpleString)
      new VecDotBound
    }
  }

  class VecDotBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(DoubleType), ArrayType(DoubleType))
    override def resultType(): DataType = DoubleType
    override def name(): String = "vec_dot"
    override def canonicalName(): String = "graft.vec_dot"
    override def isResultNullable: Boolean = true
    /** Magic method — codegen calls this directly; same null algebra as
      * the session-route expression (`DotProduct`). */
    def invoke(a: ArrayData, b: ArrayData): java.lang.Double =
      if (a == null || b == null) null
      else graft.plans.VectorOps.dotNullable(a, b)
    override def produceResult(input: InternalRow): java.lang.Double =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else invoke(input.getArray(0), input.getArray(1))
  }
}
