package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side parquet segment IO: bit-exact roundtrip of every
  * zone-supported type plus arrays/binary, no Spark job involved. */
class GraftSegmentIOSpec extends SparkSpec {

  test("segment write/read round-trips all catalog types bit-exact") {
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(10, 2)),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(DoubleType))))
    val rows: Array[InternalRow] = Array(
      new GenericInternalRow(Array[Any](1, 10L, 1.5,
        UTF8String.fromString("alpha"), true, 19000, 1690000000000000L,
        Decimal(BigDecimal("123.45"), 10, 2), Array[Byte](1, 2, 3),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(0.1, 0.2)))),
      new GenericInternalRow(Array[Any](null, null, null, null, null,
        null, null, null, null, null)))
    val dir = java.nio.file.Paths.get(tmpDir("segio"))
    val f = dir.resolve("seg-1.parquet")
    val size = GraftSegmentIO.write(f, schema, rows)
    assert(size > 0 && java.nio.file.Files.size(f) === size)

    val back = GraftSegmentIO.read(f, schema)
    assert(back.length === 2)
    val r0 = back(0)
    assert(r0.getInt(0) === 1 && r0.getLong(1) === 10L &&
      r0.getDouble(2) === 1.5 &&
      r0.getUTF8String(3).toString === "alpha" &&
      r0.getBoolean(4) && r0.getInt(5) === 19000 &&
      r0.getLong(6) === 1690000000000000L &&
      r0.getDecimal(7, 10, 2).toBigDecimal === BigDecimal("123.45") &&
      r0.getBinary(8).toSeq === Seq[Byte](1, 2, 3) &&
      r0.getArray(9).toDoubleArray().toSeq === Seq(0.1, 0.2))
    val r1 = back(1)
    assert((0 until 10).forall(r1.isNullAt),
      "null row must read back all-null")

    // and Spark's own parquet reader agrees (the file is PLAIN parquet)
    val viaSpark = spark.read.schema(schema).parquet(f.toString)
    assert(viaSpark.count() === 2)
    assert(viaSpark.where("s = 'alpha'").count() === 1)

    // a vacuumed segment reads loudly, never as empty
    java.nio.file.Files.delete(f)
    val e = intercept[java.io.FileNotFoundException](
      GraftSegmentIO.read(f, schema))
    assert(e.getMessage.contains("VACUUM"))
  }
}
