package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Real PNG container parse as a codegen expression: `png_meta(binary)` →
  * `struct<width:int, height:int, bit_depth:int, color_type:int,
  * channels:int, interlace:int, idat_bytes:bigint, n_chunks:int>`, NULL
  * for anything that is not a well-formed PNG container.
  *
  * The image twin of [[WavHeaderExpr]] (the reference treats media as
  * opaque binary + metadata; this is the decode boundary done natively).
  * The container format is public (PNG spec / RFC 2083): an 8-byte
  * signature, then length-typed chunks — 4-byte big-endian payload
  * length, 4-byte ASCII type, payload, CRC-32 over type+payload. IHDR
  * must be the first chunk (13 bytes: width, height, bit depth, color
  * type, compression, filter, interlace), IEND the last; pixel data rides
  * in one or more IDAT chunks. The parser checks the signature, validates
  * the IHDR CRC (a header probe must not trust 13 bytes that fail their
  * own checksum), enforces the legal bit-depth/color-type combinations,
  * walks the full chunk list with Long offsets (no Int overflow on
  * multi-GB assets), sums IDAT payload bytes, and requires a terminal
  * zero-length IEND. Payload bytes are skipped, not read — a metadata
  * sweep over a 100 TB asset column touches ~12 bytes per chunk, and
  * whole-stage codegen inlines the static call so the probe runs inside
  * the scan's codegen span.
  *
  * IDAT payloads are NOT inflated (that is pixel decode, not container
  * probing), so `idat_bytes` is the compressed-stream size — the real
  * quantity a storage planner bins on.
  */
object PngHeaderExpr {
  val FnName = "png_meta"

  val outType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("interlace", IntegerType, nullable = false),
    StructField("idat_bytes", LongType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def tag(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val IHDR = tag("IHDR".getBytes("US-ASCII"), 0)
  private val IDAT = tag("IDAT".getBytes("US-ASCII"), 0)
  private val IEND = tag("IEND".getBytes("US-ASCII"), 0)

  /** channels per color type (-1 = illegal type). 0 gray, 2 truecolor,
    * 3 palette, 4 gray+alpha, 6 truecolor+alpha. */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => -1
  }

  /** legal bit depths per color type (PNG spec table 11.1). */
  private def depthLegal(colorType: Int, depth: Int): Boolean = colorType match {
    case 0 => depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16
    case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
    case 2 | 4 | 6 => depth == 8 || depth == 16
    case _ => false
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue
  }

  /** Static parse — referenced by both eval and generated code. Returns
    * null unless the bytes carry a complete, well-formed PNG container:
    * signature, CRC-valid leading IHDR, ≥1 IDAT, terminal zero-length
    * IEND, every chunk inside the buffer. */
  def parse(b: Array[Byte]): InternalRow = {
    // minimum container: sig(8) + IHDR(25) + IDAT(12) + IEND(12)
    if (b == null || b.length < 57) return null
    var i = 0
    while (i < 8) { if (b(i) != Signature(i)) return null; i += 1 }
    // IHDR must be first, payload exactly 13 bytes, CRC must verify
    if (be32(b, 8) != 13L || tag(b, 12) != IHDR) return null
    if (crc32(b, 12, 17) != be32(b, 29)) return null
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val compression = b(26) & 0xff
    val filter = b(27) & 0xff
    val interlace = b(28) & 0xff
    if (width < 1 || width > Int.MaxValue || height < 1 || height > Int.MaxValue)
      return null
    val channels = channelsOf(colorType)
    if (channels < 0 || !depthLegal(colorType, bitDepth)) return null
    if (compression != 0 || filter != 0 || (interlace != 0 && interlace != 1))
      return null
    // walk the remaining chunk list (offsets in Long: a chunk size near
    // 2^31 must clamp cleanly, not wrap an Int index)
    var off = 33L
    var idatBytes = 0L
    var nIdat = 0
    var nChunks = 1 // IHDR
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > b.length) return null // truncated: no room for a chunk
      val size = be32(b, off.toInt)
      val id = tag(b, off.toInt + 4)
      val next = off + 12L + size
      if (next > b.length) return null // chunk overruns the buffer
      nChunks += 1
      if (id == IDAT) { idatBytes += size; nIdat += 1 }
      else if (id == IEND) {
        // IEND is empty and terminal — trailing garbage is not a PNG
        if (size != 0L || next != b.length) return null
        sawEnd = true
      }
      off = next
    }
    if (nIdat == 0) return null
    new GenericInternalRow(Array[Any](
      width.toInt, height.toInt, bitDepth, colorType, channels, interlace,
      idatBytes, nChunks))
  }

  /** Canonical container builder (the fixture encoder, and parse's
    * inverse on the metadata fields): signature + IHDR + the payload
    * split into ≤`idatChunk`-byte IDAT chunks (at least one, possibly
    * empty) + IEND, all CRCs real. The payload is stored as the IDAT
    * stream verbatim — the container around it is byte-exact PNG; only
    * the zlib pixel encoding is out of scope (this is the header/probe
    * boundary, not a pixel codec). */
  def pngBytes(data: Array[Byte], width: Int, height: Int,
               bitDepth: Int = 8, colorType: Int = 2, interlace: Int = 0,
               idatChunk: Int = 8192): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    require(channelsOf(colorType) > 0 && depthLegal(colorType, bitDepth),
      s"illegal PNG color type $colorType / bit depth $bitDepth")
    require(interlace == 0 || interlace == 1,
      s"illegal PNG interlace method $interlace")
    val nIdat = math.max(1, (data.length + idatChunk - 1) / idatChunk)
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 * nIdat + data.length + 12)
    out.put(Signature)
    def chunk(typ: String, payload: Array[Byte], pOff: Int, pLen: Int): Unit = {
      out.putInt(pLen)
      val typeAt = out.position()
      out.put(typ.getBytes("US-ASCII"))
      if (pLen > 0) out.put(payload, pOff, pLen)
      val c = new java.util.zip.CRC32
      c.update(out.array(), typeAt, 4 + pLen)
      out.putInt(c.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    chunk("IHDR", ihdr.array(), 0, 13)
    if (data.length == 0) chunk("IDAT", Array.emptyByteArray, 0, 0)
    else {
      var o = 0
      while (o < data.length) {
        val len = math.min(idatChunk, data.length - o)
        chunk("IDAT", data, o, len)
        o += len
      }
    }
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.array()
  }
}

/** `png_meta(binary)` — see [[PngHeaderExpr]]. */
case class PngMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngHeaderExpr.outType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PngHeaderExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // parse returns null for malformed input, so generated code branches
    // instead of unboxing blindly (same pattern as WavMeta)
    val input = child.genCode(ctx)
    val parsed = ctx.freshName("pngMeta")
    val code =
      code"""
        ${input.code}
        boolean ${ev.isNull} = ${input.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          InternalRow $parsed = graft.plans.PngHeaderExpr.parse(${input.value});
          if ($parsed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $parsed; }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): PngMeta =
    copy(child = newChild)
}
