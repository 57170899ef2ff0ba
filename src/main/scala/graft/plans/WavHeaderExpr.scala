package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Real RIFF/WAVE header parse as a codegen expression: `wav_meta(binary)`
  * → `struct<channels:int, sample_rate:int, bits:int, data_bytes:bigint,
  * n_frames:bigint>`, NULL for anything that is not a well-formed WAV.
  *
  * This is the multimodal decode boundary done natively: the container
  * format is public (RIFF chunks: 'RIFF'<size>'WAVE', then tagged chunks;
  * 'fmt ' carries PCM format fields, 'data' carries the sample payload;
  * all integers little-endian; chunks are word-aligned — odd-sized chunks
  * are followed by a pad byte). The parser walks the chunk list, so extra
  * chunks (LIST/INFO, fact, cue) and extended fmt blocks (cbSize > 16)
  * parse correctly. No library, no allocation beyond the 5-field result
  * row; whole-stage codegen inlines the static call, so metadata
  * extraction over a binary asset column runs inside the scan's codegen
  * span — the shape a 100 TB asset sweep needs (header-only reads; the
  * payload bytes never leave the row).
  *
  * n_frames = data_bytes / block_align (truncated): the sample-frame count
  * — the real temporal axis the chunk planner windows over.
  */
object WavHeaderExpr {
  val FnName = "wav_meta"

  val outType: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("data_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private val RIFF = tag("RIFF".getBytes("US-ASCII"), 0)
  private val WAVE = tag("WAVE".getBytes("US-ASCII"), 0)
  private val FMT = tag("fmt ".getBytes("US-ASCII"), 0)
  private val DATA = tag("data".getBytes("US-ASCII"), 0)

  /** Static parse — referenced by both eval and generated code. Returns
    * null unless the bytes carry a RIFF/WAVE container with a ≥16-byte
    * 'fmt ' chunk and a 'data' chunk that fits inside the buffer. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) != RIFF || tag(b, 8) != WAVE) return null
    var off = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var blockAlign = -1
    var dataBytes = -1L
    while (off + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val id = tag(b, off)
      val size = le32(b, off + 4)
      // a size that cannot fit the buffer is a lie (or truncation): bail
      // before the skip arithmetic can overflow
      if (size > b.length) return null
      val body = off + 8
      if (id == FMT) {
        if (size < 16 || body + 16 > b.length) return null
        channels = le16(b, body + 2)
        sampleRate = le32(b, body + 4).toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (id == DATA) {
        if (body + size > b.length) return null
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte. Advance in
      // Long: body + size can exceed Int.MaxValue for ~GB payloads, and a
      // wrapped-negative offset would index out of bounds instead of
      // honoring the NULL-for-malformed contract. Clamping to b.length
      // exits the loop, where the completeness check below decides.
      val next = body.toLong + size + (size & 1L)
      off = if (next > b.length) b.length else next.toInt
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || blockAlign <= 0 ||
      dataBytes < 0) return null
    new GenericInternalRow(Array[Any](
      channels, sampleRate, bits, dataBytes, dataBytes / blockAlign))
  }

  /** Canonical PCM WAV container around raw sample bytes — the fixture
    * builder (and the reference encoder shape): 44-byte header + data
    * (+ pad byte when data length is odd). */
  def wavBytes(data: Array[Byte], sampleRate: Int, channels: Int,
               bits: Int = 16): Array[Byte] = {
    val blockAlign = channels * (bits / 8)
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(44 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(36 + data.length + pad)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(16)                       // PCM fmt chunk size
    out.putShort(1)                      // audio format: PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign)  // byte rate
    out.putShort(blockAlign.toShort)
    out.putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII"))
    out.putInt(data.length)
    out.put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }
}

/** `wav_meta(binary)` — see [[WavHeaderExpr]]. */
case class WavMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavHeaderExpr.outType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WavHeaderExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // parse returns null for malformed input, so generated code branches
    // instead of unboxing blindly (same pattern as ShingleMinHash)
    val input = child.genCode(ctx)
    val parsed = ctx.freshName("wavMeta")
    val code =
      code"""
        ${input.code}
        boolean ${ev.isNull} = ${input.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          InternalRow $parsed = graft.plans.WavHeaderExpr.parse(${input.value});
          if ($parsed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $parsed; }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}
