package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** BmpCodec against a HAND-BUILT golden byte fixture (the canonical 2×2
  * 24bpp example from the BMP format spec) — written out literally, never
  * produced by the encoder, so an encode/decode-symmetric bug (both sides
  * agreeing on a wrong row order or channel order) cannot cancel out the
  * way it could in the q140 round-trip gate.
  */
class BmpCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // the classic 70-byte 2×2 example: bottom row red|white, top row
  // blue|green, rows bottom-up, 2-byte padding per 6-byte row, BGR on disk
  private def golden2x2: Array[Byte] = {
    def le4(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le2(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val b = Array.newBuilder[Byte]
    b ++= Array[Byte]('B', 'M')
    b ++= le4(70); b ++= le4(0); b ++= le4(54)            // size, reserved, offset
    b ++= le4(40); b ++= le4(2); b ++= le4(2)             // DIB, width, height
    b ++= le2(1); b ++= le2(24)                           // planes, bpp
    b ++= le4(0); b ++= le4(16)                           // BI_RGB, image size
    b ++= le4(2835); b ++= le4(2835); b ++= le4(0); b ++= le4(0)
    // bottom row: red (00 00 FF), white (FF FF FF), pad
    b ++= Array[Byte](0, 0, -1, -1, -1, -1, 0, 0)
    // top row: blue (FF 00 00), green (00 FF 00), pad
    b ++= Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0)
    b.result()
  }

  // image (x, y from TOP-left): (0,0) blue, (1,0) green, (0,1) red,
  // (1,1) white; weight(x,y) = 1 + x + 2y
  private val goldenPixel: (Int, Int) => (Int, Int, Int) = {
    case (0, 0) => (0, 0, 255)
    case (1, 0) => (0, 255, 0)
    case (0, 1) => (255, 0, 0)
    case (1, 1) => (255, 255, 255)
    case _      => (0, 0, 0)
  }

  test("decode parses the golden hand-built 2x2 fixture: dims + position-weighted sums") {
    val d = BmpCodec.decode(golden2x2)
    assert(d.width === 2 && d.height === 2)
    assert(d.rSum === 3L * 255 + 4L * 255) // red@(0,1) wt3, white@(1,1) wt4
    assert(d.gSum === 2L * 255 + 4L * 255) // green@(1,0) wt2, white wt4
    assert(d.bSum === 1L * 255 + 4L * 255) // blue@(0,0) wt1, white wt4
  }

  test("encode reproduces the golden fixture byte-for-byte") {
    assert(BmpCodec.encode(2, 2, goldenPixel).toSeq === golden2x2.toSeq)
  }

  test("top-down BMPs (negative biHeight) decode to the same features") {
    val b = golden2x2.clone()
    // height field at offset 22 := -2 (little-endian two's complement)
    b(22) = -2; b(23) = -1; b(24) = -1; b(25) = -1
    // swap the two pixel rows: top-down stores the TOP row first
    val tmp = b.slice(54, 62)
    System.arraycopy(b, 62, b, 54, 8)
    System.arraycopy(tmp, 0, b, 62, 8)
    val d = BmpCodec.decode(b)
    val ref = BmpCodec.decode(golden2x2)
    assert((d.width, d.height, d.rSum, d.gSum, d.bSum) ===
      (ref.width, ref.height, ref.rSum, ref.gSum, ref.bSum))
  }

  test("row padding is honored at every width mod 4 (1..8 wide)") {
    for (w <- 1 to 8; h <- Seq(1, 3)) {
      val pixel = (x: Int, y: Int) => ((x * 5 + y * 17) % 256, (x * 3) % 256, (y * 7) % 256)
      val d = BmpCodec.decode(BmpCodec.encode(w, h, pixel))
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val wt = 1L + x + y.toLong * w
        val (r, g, b) = pixel(x, y)
        rs += wt * r; gs += wt * g; bs += wt * b
      }
      assert((d.width, d.height, d.rSum, d.gSum, d.bSum) === (w, h, rs, gs, bs),
        s"mismatch at ${w}x$h")
    }
  }

  test("decode fails loudly on non-BMP input: bad magic, unsupported bpp, compression, truncation") {
    val ok = golden2x2
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val badMagic = ok.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](BmpCodec.decode(badMagic))
    val bpp32 = ok.clone(); bpp32(28) = 32
    intercept[IllegalArgumentException](BmpCodec.decode(bpp32))
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](BmpCodec.decode(rle))
    intercept[IllegalArgumentException](BmpCodec.decode(ok.take(60)))
    // pixel offset pointing inside the header must fail loudly, not read
    // header bytes as pixels
    val badOff = ok.clone(); badOff(10) = 0
    intercept[IllegalArgumentException](BmpCodec.decode(badOff))
    // forged huge width must hit the Long-arithmetic bounds check, not
    // overflow Int into a passing one
    val hugeW = ok.clone()
    hugeW(18) = -1; hugeW(19) = -1; hugeW(20) = -1; hugeW(21) = 0x7f // width = Int.MaxValue
    intercept[IllegalArgumentException](BmpCodec.decode(hugeW))
  }

  test("extractBmpFeatures: distributed decode matches the local decoder and is partition-invariant") {
    import spark.implicits._
    val ids = (0L until 40L)
    val media = ids.map { id =>
      val w = 1 + (id % 7).toInt
      val h = 1 + (id % 4).toInt
      (id, BmpCodec.encode(w, h, (x, y) => (
        ((id * 31 + x * 7 + y * 13) % 256).toInt,
        ((id * 17 + x * 11 + y * 5) % 256).toInt,
        ((id * 29 + x * 3 + y * 19) % 256).toInt)))
    }
    val df = media.toDF("id", "media")
    val got = Multimodal.extractBmpFeatures(df.repartition(7)).toDF()
      .orderBy("id")
      .as[(Long, Long, Int, Int, Long, Long, Long)].collect().toSeq
    val expected = media.map { case (id, bytes) =>
      val d = BmpCodec.decode(bytes)
      (id, bytes.length.toLong, d.width, d.height, d.rSum, d.gSum, d.bSum)
    }
    assert(got === expected)
  }
}
