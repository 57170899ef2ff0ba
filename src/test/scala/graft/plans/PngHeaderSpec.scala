package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity and malformed-input coverage for the PNG container parse
  * (`png_meta`) on crafted byte arrays — the static parser, interpreted
  * eval and the SQL/codegen route must agree (the WavHeaderSpec pattern
  * applied to the image twin).
  */
class PngHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def fields(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int, Long, Int)] =
    Option(PngHeaderExpr.parse(bytes)).map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getLong(6), r.getInt(7)))

  test("canonical container round-trips the builder (builder ∘ parser ≡ id)") {
    val png = PngHeaderExpr.pngBytes(Array.tabulate(10)(_.toByte),
      width = 640, height = 480)
    assert(png.length === 8 + 25 + 12 + 10 + 12)
    // truecolor (2) → 3 channels; one 10-byte IDAT; 3 chunks total
    assert(fields(png) === Some((640, 480, 8, 2, 3, 0, 10L, 3)))
  }

  test("payload splits into multiple IDAT chunks; walk sums them") {
    val data = Array.tabulate(700)(i => (i % 251).toByte)
    val png = PngHeaderExpr.pngBytes(data, width = 32, height = 16,
      colorType = 6, interlace = 1, idatChunk = 256)
    // 700 bytes at ≤256/chunk → 3 IDATs; IHDR + 3×IDAT + IEND = 5 chunks
    assert(png.length === 8 + 25 + 3 * 12 + 700 + 12)
    assert(fields(png) === Some((32, 16, 8, 6, 4, 1, 700L, 5)))
  }

  test("empty payload still writes (and parses) one empty IDAT") {
    val png = PngHeaderExpr.pngBytes(Array.emptyByteArray, 1, 1,
      bitDepth = 1, colorType = 0)
    assert(fields(png) === Some((1, 1, 1, 0, 1, 0, 0L, 3)))
  }

  test("gray/palette/alpha color types map to their channel counts") {
    def ct(colorType: Int, depth: Int): Int =
      fields(PngHeaderExpr.pngBytes(Array[Byte](1), 2, 2,
        bitDepth = depth, colorType = colorType)).get._5
    assert(ct(0, 8) === 1)   // grayscale
    assert(ct(2, 16) === 3)  // truecolor
    assert(ct(3, 4) === 1)   // palette-indexed
    assert(ct(4, 8) === 2)   // gray + alpha
    assert(ct(6, 8) === 4)   // truecolor + alpha
  }

  test("malformed inputs return NULL, never throw") {
    val good = PngHeaderExpr.pngBytes(Array.tabulate(20)(_.toByte), 8, 8)
    assert(fields(Array.empty[Byte]) === None)
    assert(fields("definitely not a png".getBytes("UTF-8")) === None)
    assert(fields(good.take(40)) === None)          // truncated inside IHDR walk
    assert(fields(good.dropRight(1)) === None)      // missing IEND tail byte
    val badSig = good.clone(); badSig(0) = 0x88.toByte
    assert(fields(badSig) === None)                 // wrong signature
    val badCrc = good.clone(); badCrc(16) = (badCrc(16) ^ 1).toByte
    assert(fields(badCrc) === None)                 // IHDR fails its CRC
    val zeroDim = PngHeaderExpr.pngBytes(Array[Byte](1), 1, 1)
    zeroDim(19) = 0.toByte                          // width 1 → 0 (CRC now stale too)
    assert(fields(zeroDim) === None)
    // declared IDAT length far beyond the buffer: bail, no overflow
    val lying = good.clone()
    lying(33) = 0x7f.toByte; lying(34) = 0xff.toByte
    assert(fields(lying) === None)
    // trailing garbage after IEND is not a PNG
    assert(fields(good ++ Array[Byte](0)) === None)
    // an illegal bit-depth/color-type combo is rejected even with a
    // recomputed CRC (container must lie consistently to prove the check)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(4).put(3.toByte).put(2.toByte) // depth 3: illegal
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val forged = good.clone()
    System.arraycopy(ihdr.array(), 0, forged, 16, 13)
    val c = new java.util.zip.CRC32; c.update(forged, 12, 17)
    val crc = java.nio.ByteBuffer.allocate(4).putInt(c.getValue.toInt).array()
    System.arraycopy(crc, 0, forged, 29, 4)
    assert(fields(forged) === None)
  }

  test("builder rejects dims/combos the parser would refuse") {
    intercept[IllegalArgumentException](
      PngHeaderExpr.pngBytes(Array[Byte](1), 0, 4))
    intercept[IllegalArgumentException](
      PngHeaderExpr.pngBytes(Array[Byte](1), 4, 4, bitDepth = 4, colorType = 2))
    intercept[IllegalArgumentException](
      PngHeaderExpr.pngBytes(Array[Byte](1), 4, 4, interlace = 2))
  }

  test("randomized round-trip: parse ∘ build ≡ identity; corruption and truncation never throw") {
    val rnd = new scala.util.Random(97)
    val legal = Seq(0 -> Seq(1, 2, 4, 8, 16), 2 -> Seq(8, 16),
      3 -> Seq(1, 2, 4, 8), 4 -> Seq(8, 16), 6 -> Seq(8, 16))
    val channelsOf = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)
    for (trial <- 1 to 200) {
      val data = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      val w = 1 + rnd.nextInt(5000)
      val h = 1 + rnd.nextInt(5000)
      val (ct, depths) = legal(rnd.nextInt(legal.length))
      val depth = depths(rnd.nextInt(depths.length))
      val il = rnd.nextInt(2)
      val chunk = 1 + rnd.nextInt(600)
      val png = PngHeaderExpr.pngBytes(data, w, h, depth, ct, il, chunk)
      val nIdat = math.max(1, (data.length + chunk - 1) / chunk)
      assert(fields(png) === Some((w, h, depth, ct, channelsOf(ct), il,
        data.length.toLong, 2 + nIdat)), s"trial $trial")
      // any single-bit corruption of the IHDR payload must fail its CRC
      val corrupt = png.clone()
      val pos = 16 + rnd.nextInt(13)
      corrupt(pos) = (corrupt(pos) ^ (1 << rnd.nextInt(8))).toByte
      assert(fields(corrupt) === None, s"trial $trial: IHDR bit flip at $pos")
    }
    // arbitrary byte soup: parse never throws (NULL or a lucky miss, only)
    for (_ <- 1 to 300)
      fields(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
    // every strict prefix of a valid container is malformed, not a crash
    val full = PngHeaderExpr.pngBytes(Array.tabulate(300)(_.toByte), 10, 10,
      idatChunk = 128)
    for (cut <- 0 until full.length)
      assert(fields(full.take(cut)) === None, s"prefix $cut parsed")
  }

  test("SQL/codegen route equals the static parser on a batch of PNGs") {
    val rows = (1 to 50).map { i =>
      val data = Array.tabulate(i * 17 % 600 + 1)(j => ((i * 7 + j) % 251).toByte)
      val ct = Seq(0, 2, 6)(i % 3)
      (i.toLong, PngHeaderExpr.pngBytes(data, width = 16 + i, height = 16 + 2 * i,
        colorType = ct, interlace = i % 2, idatChunk = 256))
    }
    val got = rows.toDF("id", "png")
      .select(col("id"), GraftFunctions.pngMeta(col("png")).as("p"))
      .select(col("id"), col("p.width"), col("p.height"), col("p.bit_depth"),
        col("p.color_type"), col("p.channels"), col("p.interlace"),
        col("p.idat_bytes"), col("p.n_chunks"))
      .orderBy("id").collect().map(r =>
        (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getInt(6), r.getLong(7), r.getInt(8))))
    rows.foreach { case (id, png) =>
      assert(got(id.toInt - 1) === ((id, fields(png).get)))
    }
    // a non-PNG row surfaces as NULL through SQL too
    val nulls = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "png")
      .select(GraftFunctions.pngMeta(col("png")).as("p"))
    assert(nulls.filter(col("p").isNull).count() === 1)
  }
}
