package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity and malformed-input coverage for the RIFF/AVI container
  * parse (`avi_meta`) on crafted byte arrays — the static parser,
  * interpreted eval and the SQL/codegen route must agree (the
  * WavHeaderSpec/PngHeaderSpec pattern applied to the video twin).
  */
class AviHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def fields(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Long, Int)] =
    Option(AviHeaderExpr.parse(bytes)).map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getInt(6)))

  test("canonical container round-trips the builder (builder ∘ parser ≡ id)") {
    val avi = AviHeaderExpr.aviBytes(Array.tabulate(10)(_.toByte),
      width = 640, height = 480, usPerFrame = 33333)
    // RIFF(12) + LIST hdrl(8+68) + LIST movi(8+4) + chunk(8+10)
    assert(avi.length === 12 + 76 + 12 + 8 + 10)
    // one 10-byte frame chunk, 1 stream
    assert(fields(avi) === Some((640, 480, 33333, 1, 1, 10L, 1)))
  }

  test("payload splits into multiple frame chunks; movi census sums them") {
    val data = Array.tabulate(1300)(i => (i % 251).toByte)
    val avi = AviHeaderExpr.aviBytes(data, width = 320, height = 240,
      usPerFrame = 40000, frameChunk = 512)
    // 1300 bytes at ≤512/frame → 3 chunks (512, 512, 276); all even
    assert(avi.length === 100 + 1300 + 3 * 8)
    assert(fields(avi) === Some((320, 240, 40000, 3, 1, 1300L, 3)))
  }

  test("empty payload still writes (and parses) one empty frame chunk") {
    val avi = AviHeaderExpr.aviBytes(Array.emptyByteArray, 1, 1,
      usPerFrame = 41667)
    assert(fields(avi) === Some((1, 1, 41667, 1, 1, 0L, 1)))
  }

  test("odd-sized last chunk is word-aligned with one pad byte") {
    val avi = AviHeaderExpr.aviBytes(Array.tabulate(515)(_.toByte), 2, 2,
      usPerFrame = 1, frameChunk = 512)
    // chunks 512 + 3(+1 pad): total = 100 + 515 + 1 + 16
    assert(avi.length === 100 + 515 + 1 + 2 * 8)
    assert(fields(avi) === Some((2, 2, 1, 2, 1, 515L, 2)))
  }

  // canonical single-chunk container layout (data length even):
  //   0 'RIFF'  4 riffSize  8 'AVI '
  //  12 'LIST' 16 hdrlSize 20 'hdrl' 24 'avih' 28 56  32..87 avih payload
  //  88 'LIST' 92 moviSize 96 'movi' 100 '00dc' 104 len  108.. data
  private def patchLe32(b: Array[Byte], off: Int, delta: Int): Unit = {
    val v = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)) + delta
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  test("audio '##wb' blocks add to movi_bytes but not the frame count") {
    // the movi list is the container's tail: appending a chunk and
    // growing the movi + RIFF sizes keeps it inside the list
    val base = AviHeaderExpr.aviBytes(Array.tabulate(6)(_.toByte), 8, 8,
      usPerFrame = 1000)
    assert(base.length === 114)
    val out = base ++ "01wb".getBytes("US-ASCII") ++ le32(4) ++
      Array[Byte](1, 2, 3, 4)
    patchLe32(out, 4, 12)   // RIFF size
    patchLe32(out, 92, 12)  // movi LIST size
    // 6 video + 4 audio bytes; still 1 frame chunk
    assert(fields(out) === Some((8, 8, 1000, 1, 1, 10L, 1)))
  }

  test("unknown top-level chunks (JUNK / idx1) are skipped, not fatal") {
    val base = AviHeaderExpr.aviBytes(Array.tabulate(20)(_.toByte), 16, 16,
      usPerFrame = 2000)
    // a top-level JUNK chunk after movi, RIFF size grown to match
    val out = base ++ "JUNK".getBytes("US-ASCII") ++ le32(6) ++
      Array.fill(6)(0.toByte)
    patchLe32(out, 4, 14)
    assert(fields(out) === Some((16, 16, 2000, 1, 1, 20L, 1)))
  }

  test("malformed inputs return NULL, never throw") {
    val good = AviHeaderExpr.aviBytes(Array.tabulate(30)(_.toByte), 10, 10,
      usPerFrame = 5000)
    assert(fields(Array.empty[Byte]) === None)
    assert(fields("definitely not an avi container..".getBytes("UTF-8") ++
      Array.fill(80)(0.toByte)) === None)
    assert(fields(good.take(60)) === None)            // truncated mid-hdrl
    assert(fields(good.dropRight(1)) === None)        // declared size lies
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(fields(badSig) === None)                   // not RIFF
    val badForm = good.clone(); badForm(8) = 'W'.toByte
    assert(fields(badForm) === None)                  // not 'AVI '
    // a WAV is RIFF but not an AVI
    val wav = WavHeaderExpr.wavBytes(Array.tabulate(10)(_.toByte), 8000, 1)
    assert(fields(wav) === None)
    // zero width: recompute nothing (width sits in avih payload at 32)
    val zeroW = good.clone()
    zeroW(12 + 8 + 4 + 8 + 32) = 0; zeroW(12 + 8 + 4 + 8 + 33) = 0
    zeroW(12 + 8 + 4 + 8 + 34) = 0; zeroW(12 + 8 + 4 + 8 + 35) = 0
    assert(fields(zeroW) === None)
    // a movi subchunk whose declared size overruns its list
    val lying = good.clone()
    lying(104) = 0x7f.toByte; lying(105) = 0x7f.toByte
    assert(fields(lying) === None)
  }

  test("real-world tolerances: trailing bytes and hdrl padding parse") {
    // the r7-advice leniencies: strictness is scoped to the DECLARED RIFF
    // extent, matching what real muxers emit and probes accept
    val good = AviHeaderExpr.aviBytes(Array.tabulate(30)(_.toByte), 10, 10,
      usPerFrame = 5000)
    val expect = fields(good)
    assert(expect.isDefined)
    // trailing JUNK outside the declared RIFF size: ignored, same parse
    assert(fields(good ++ Array.fill(16)(0x4a.toByte)) === expect)
    // an OpenDML-style 'AVIX' continuation segment after the first RIFF:
    // the probe reads the first segment (its movi census), like tooling
    val avix = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avix.put("RIFF".getBytes("US-ASCII")); avix.putInt(16)
    avix.put("AVIX".getBytes("US-ASCII"))
    avix.put("LIST".getBytes("US-ASCII")); avix.putInt(4)
    avix.put("movi".getBytes("US-ASCII"))
    assert(fields(good ++ avix.array()) === expect)
    // hdrl whose avih sits BEHIND a JUNK pad subchunk (padded muxer
    // layout): the parser must walk to it, not demand it first
    val hdrlSize = 4 + (8 + 4) + (8 + 56)
    val moviSize = 4 + (8 + 2)
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(total - 8)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(hdrlSize)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("JUNK".getBytes("US-ASCII")); bb.putInt(4); bb.putInt(0)
    bb.put("avih".getBytes("US-ASCII")); bb.putInt(56)
    bb.putInt(20000)                    // dwMicroSecPerFrame
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(1)                        // dwTotalFrames
    bb.putInt(0)
    bb.putInt(1)                        // dwStreams
    bb.putInt(0)
    bb.putInt(64); bb.putInt(48)        // dwWidth, dwHeight
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(moviSize)
    bb.put("movi".getBytes("US-ASCII"))
    bb.put("00dc".getBytes("US-ASCII")); bb.putInt(2)
    bb.put(Array[Byte](7, 8))
    assert(fields(bb.array()) === Some((64, 48, 20000, 1, 1, 2L, 1)))
    // but a hdrl with NO avih anywhere is still not an AVI
    val noAvih = bb.array().clone()
    // overwrite the avih tag (it sits after RIFF(12)+LIST hdr(8)+type(4)+JUNK(12))
    System.arraycopy("JUNX".getBytes("US-ASCII"), 0, noAvih, 36, 4)
    assert(fields(noAvih) === None)
  }

  test("builder rejects params the parser would refuse") {
    intercept[IllegalArgumentException](
      AviHeaderExpr.aviBytes(Array[Byte](1), 0, 4, 1000))
    intercept[IllegalArgumentException](
      AviHeaderExpr.aviBytes(Array[Byte](1), 4, 4, 0))
    intercept[IllegalArgumentException](
      AviHeaderExpr.aviBytes(Array[Byte](1), 4, 4, 1000, frameChunk = 0))
  }

  test("randomized round-trip: parse ∘ build ≡ identity; corruption and truncation never throw") {
    val rnd = new scala.util.Random(131)
    for (trial <- 1 to 200) {
      val data = Array.fill(rnd.nextInt(4000))(rnd.nextInt(256).toByte)
      val w = 1 + rnd.nextInt(8192)
      val h = 1 + rnd.nextInt(8192)
      val us = 1 + rnd.nextInt(100000)
      val chunk = 1 + rnd.nextInt(900)
      val avi = AviHeaderExpr.aviBytes(data, w, h, us, chunk)
      val n = math.max(1, (data.length + chunk - 1) / chunk)
      assert(fields(avi) === Some((w, h, us, n, 1, data.length.toLong, n)),
        s"trial $trial")
      // declared-size integrity: any truncation must parse NULL
      assert(fields(avi.take(avi.length - 1 - rnd.nextInt(avi.length - 1)))
        === None, s"trial $trial truncation")
    }
    // arbitrary byte soup: parse never throws (NULL or a lucky miss, only)
    for (_ <- 1 to 300)
      fields(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }

  test("SQL/codegen route equals the static parser on a batch of AVIs") {
    val rows = (1 to 50).map { i =>
      val data = Array.tabulate(i * 37 % 1200 + 1)(j => ((i * 7 + j) % 251).toByte)
      (i.toLong, AviHeaderExpr.aviBytes(data, width = 16 + i, height = 16 + 2 * i,
        usPerFrame = 1000 * i, frameChunk = 256))
    }
    val got = rows.toDF("id", "avi")
      .select(col("id"), GraftFunctions.aviMeta(col("avi")).as("v"))
      .select(col("id"), col("v.width"), col("v.height"), col("v.us_per_frame"),
        col("v.n_frames"), col("v.n_streams"), col("v.movi_bytes"),
        col("v.n_frame_chunks"))
      .orderBy("id").collect().map(r =>
        (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getLong(6), r.getInt(7))))
    rows.foreach { case (id, avi) =>
      assert(got(id.toInt - 1) === ((id, fields(avi).get)))
    }
    // a non-AVI row surfaces as NULL through SQL too
    val nulls = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "avi")
      .select(GraftFunctions.aviMeta(col("avi")).as("v"))
    assert(nulls.filter(col("v").isNull).count() === 1)
  }
}
