package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Real RIFF/AVI container parse as a codegen expression: `avi_meta(binary)`
  * → `struct<width:int, height:int, us_per_frame:int, n_frames:int,
  * n_streams:int, movi_bytes:bigint, n_frame_chunks:int>`, NULL for
  * anything that is not a well-formed AVI container.
  *
  * The video twin of [[WavHeaderExpr]] (the reference treats media as
  * opaque binary + metadata; this is the decode boundary done natively) —
  * and it literally reuses the RIFF chunk grammar WAV proved out: an AVI
  * is `'RIFF'<size>'AVI '` followed by word-aligned tagged chunks, except
  * the interesting chunks are `LIST`s carrying a 4-byte list type and
  * nested subchunks (OpenDML / the original VFW spec, both public). The
  * main header rides in `LIST 'hdrl'` whose FIRST subchunk must be
  * `'avih'` (56-byte payload: dwMicroSecPerFrame, dwMaxBytesPerSec,
  * dwPaddingGranularity, dwFlags, dwTotalFrames, dwInitialFrames,
  * dwStreams, dwSuggestedBufferSize, dwWidth, dwHeight, 4 reserved
  * dwords); frame data rides in `LIST 'movi'` as `##dc`/`##db` (video)
  * and `##wb` (audio) chunks. The parser walks both lists with Long
  * offsets (no Int overflow on multi-GB assets), validates the declared
  * RIFF size against the buffer (truncation and trailing garbage are not
  * an AVI), skips unknown chunks (strl, JUNK, idx1, odml) by size, and
  * CENSUSES the movi list — frame-chunk count and summed payload bytes —
  * so header claims and actual contents are independently reported.
  * Payload bytes are skipped, not read: a metadata sweep over a 100 TB
  * asset column touches ~12 bytes per chunk, and whole-stage codegen
  * inlines the static call into the scan's codegen span.
  *
  * Reference treats video metadata as a decode-stage output
  * (media assets land as opaque files; Notebooks/automated_ingestion
  * .Notebook/notebook-content.py ingests payloads untyped) — this
  * expression is that decode boundary for the AVI container format.
  */
object AviHeaderExpr {
  val FnName = "avi_meta"

  val outType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("us_per_frame", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_streams", IntegerType, nullable = false),
    StructField("movi_bytes", LongType, nullable = false),
    StructField("n_frame_chunks", IntegerType, nullable = false)))

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private val RIFF = tag("RIFF".getBytes("US-ASCII"), 0)
  private val AVI = tag("AVI ".getBytes("US-ASCII"), 0)
  private val LIST = tag("LIST".getBytes("US-ASCII"), 0)
  private val HDRL = tag("hdrl".getBytes("US-ASCII"), 0)
  private val MOVI = tag("movi".getBytes("US-ASCII"), 0)
  private val AVIH = tag("avih".getBytes("US-ASCII"), 0)

  /** Is `id` a movi data chunk (`##dc`/`##db` video frame, `##wb` audio
    * block)? The two leading bytes are the ASCII stream number; only the
    * suffix classifies. */
  private def isFrameChunk(id: Int): Boolean = {
    val c2 = (id >>> 16) & 0xff
    val c3 = (id >>> 24) & 0xff
    (c2 == 'd' && (c3 == 'c' || c3 == 'b'))
  }
  private def isAudioChunk(id: Int): Boolean =
    ((id >>> 16) & 0xff) == 'w' && ((id >>> 24) & 0xff) == 'b'

  /** Static parse — referenced by both eval and generated code. Returns
    * null unless the bytes carry a complete RIFF/'AVI ' container with a
    * `LIST 'hdrl'` holding a ≥56-byte `'avih'` (leading non-avih
    * subchunks — JUNK padding, vendor headers — are skipped, as real
    * muxers emit them) and a `LIST 'movi'`; all chunk walks
    * bounds-checked in Long. TRUNCATION (declared size past the buffer)
    * is still null, but bytes BEYOND the declared RIFF extent are
    * tolerated and ignored — trailing JUNK outside the RIFF size and
    * OpenDML 'AVIX' continuation segments live there, and a probe reads
    * the first (standard) segment exactly like real tooling does. */
  def parse(b: Array[Byte]): InternalRow = {
    // minimum: RIFF(12) + LIST hdrl(12 + avih 8+56) + LIST movi(12)
    if (b == null || b.length < 100) return null
    if (tag(b, 0) != RIFF || tag(b, 8) != AVI) return null
    // the declared RIFF size covers everything after the 8-byte header;
    // declaring MORE than the buffer holds is truncation — not an AVI.
    // The walk below is bounded by the declared extent, so trailing
    // bytes past it never participate.
    val riffEnd = le32(b, 4) + 8L
    if (riffEnd > b.length.toLong || riffEnd < 100L) return null
    var off = 12L
    var usPerFrame = -1L
    var totalFrames = -1L
    var streams = -1L
    var width = -1L
    var height = -1L
    var sawMovi = false
    var moviBytes = 0L
    var frameChunks = 0
    while (off + 8 <= riffEnd) {
      val id = tag(b, off.toInt)
      val size = le32(b, off.toInt + 4)
      val body = off + 8
      if (body + size > riffEnd) return null // chunk overruns the extent
      if (id == LIST) {
        if (size < 4) return null // a LIST must at least carry its type
        val listType = tag(b, body.toInt)
        if (listType == HDRL) {
          // the VFW spec puts avih first, but real muxers pad hdrl with
          // JUNK or vendor chunks ahead of it — walk the subchunks and
          // take the FIRST avih (≥56-byte payload; exactly 56 in-spec,
          // tolerate extensions); a hdrl with none fails the field
          // validation below
          var sub = body + 4
          val end = body + size
          var found = false
          while (!found && sub + 8 <= end) {
            val sid = tag(b, sub.toInt)
            val ssize = le32(b, sub.toInt + 4)
            if (sub + 8 + ssize > end) return null // ragged hdrl subchunk
            if (sid == AVIH) {
              if (ssize < 56) return null
              val p = sub.toInt + 8
              usPerFrame = le32(b, p)
              totalFrames = le32(b, p + 16)
              streams = le32(b, p + 24)
              width = le32(b, p + 32)
              height = le32(b, p + 36)
              found = true
            }
            sub += 8 + ssize + (ssize & 1L)
          }
        } else if (listType == MOVI) {
          sawMovi = true
          // census the data chunks: count frames, sum ALL data-chunk
          // payload bytes (video + audio blocks); skip nested rec-LISTs
          // and anything else by size
          var sub = body + 4
          val end = body + size
          while (sub + 8 <= end) {
            val sid = tag(b, sub.toInt)
            val ssize = le32(b, sub.toInt + 4)
            val sbody = sub + 8
            if (sbody + ssize > end) return null
            if (isFrameChunk(sid)) { frameChunks += 1; moviBytes += ssize }
            else if (isAudioChunk(sid)) moviBytes += ssize
            sub = sbody + ssize + (ssize & 1L)
          }
          if (sub != end && sub != end + 1) return null // ragged movi tail
        }
      }
      off = body + size + (size & 1L)
    }
    if (off != riffEnd && off != riffEnd + 1) return null // ragged tail
    if (usPerFrame < 1 || totalFrames < 0 || streams < 1 || width < 1 ||
      height < 1 || !sawMovi) return null
    // header dwords are unsigned 32-bit; anything beyond Int.MaxValue in
    // these fields is not a sane AVI (2147s/frame, 2^31 streams...)
    if (usPerFrame > Int.MaxValue || totalFrames > Int.MaxValue ||
      streams > Int.MaxValue || width > Int.MaxValue || height > Int.MaxValue)
      return null
    new GenericInternalRow(Array[Any](
      width.toInt, height.toInt, usPerFrame.toInt, totalFrames.toInt,
      streams.toInt, moviBytes, frameChunks))
  }

  /** Canonical AVI container around raw frame bytes — the fixture builder
    * (parse's inverse on the metadata fields): RIFF header, `LIST 'hdrl'`
    * holding one in-spec 56-byte `'avih'`, `LIST 'movi'` with the payload
    * split into ≤`frameChunk`-byte `'00dc'` frame chunks (at least one,
    * possibly empty; odd-sized chunks pad per RIFF word alignment).
    * dwTotalFrames = the real chunk count, so builder ∘ parser ≡ identity
    * covers the movi census too. The frame payload is stored verbatim —
    * the container around it is byte-exact AVI; only the codec bitstream
    * inside the frames is out of scope (this is the header/probe
    * boundary, not a video codec). */
  def aviBytes(data: Array[Byte], width: Int, height: Int,
               usPerFrame: Int, frameChunk: Int = 512): Array[Byte] = {
    require(width > 0 && height > 0, "avi dims must be positive")
    require(usPerFrame > 0, "avi frame duration must be positive")
    require(frameChunk > 0, "avi frame chunk must be positive")
    val nFrames = math.max(1, (data.length + frameChunk - 1) / frameChunk)
    // per-chunk pad bytes: chunk i covers [i*frameChunk, min((i+1)*fc, len))
    var padBytes = 0
    var i = 0
    while (i < nFrames) {
      val len = math.min(frameChunk, data.length - i * frameChunk)
      padBytes += (math.max(len, 0) & 1)
      i += 1
    }
    val hdrlSize = 4 + 8 + 56                       // 'hdrl' + avih chunk
    val moviSize = 4 + 8 * nFrames + data.length + padBytes
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(total - 8)
    out.put("AVI ".getBytes("US-ASCII"))
    out.put("LIST".getBytes("US-ASCII"))
    out.putInt(hdrlSize)
    out.put("hdrl".getBytes("US-ASCII"))
    out.put("avih".getBytes("US-ASCII"))
    out.putInt(56)
    out.putInt(usPerFrame)                          // dwMicroSecPerFrame
    out.putInt(0)                                   // dwMaxBytesPerSec
    out.putInt(0)                                   // dwPaddingGranularity
    out.putInt(0)                                   // dwFlags
    out.putInt(nFrames)                             // dwTotalFrames
    out.putInt(0)                                   // dwInitialFrames
    out.putInt(1)                                   // dwStreams
    out.putInt(frameChunk)                          // dwSuggestedBufferSize
    out.putInt(width)                               // dwWidth
    out.putInt(height)                              // dwHeight
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0) // reserved
    out.put("LIST".getBytes("US-ASCII"))
    out.putInt(moviSize)
    out.put("movi".getBytes("US-ASCII"))
    if (data.length == 0) {
      out.put("00dc".getBytes("US-ASCII"))
      out.putInt(0)
    } else {
      var o = 0
      while (o < data.length) {
        val len = math.min(frameChunk, data.length - o)
        out.put("00dc".getBytes("US-ASCII"))
        out.putInt(len)
        out.put(data, o, len)
        if ((len & 1) == 1) out.put(0.toByte)
        o += len
      }
    }
    out.array()
  }
}

/** `avi_meta(binary)` — see [[AviHeaderExpr]]. */
case class AviMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AviHeaderExpr.outType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AviHeaderExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // parse returns null for malformed input, so generated code branches
    // instead of unboxing blindly (same pattern as WavMeta/PngMeta)
    val input = child.genCode(ctx)
    val parsed = ctx.freshName("aviMeta")
    val code =
      code"""
        ${input.code}
        boolean ${ev.isNull} = ${input.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          InternalRow $parsed = graft.plans.AviHeaderExpr.parse(${input.value});
          if ($parsed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $parsed; }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): AviMeta =
    copy(child = newChild)
}
