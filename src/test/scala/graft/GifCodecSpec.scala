package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{BmpCodec, GifCodec, ImageIoCodec}
import org.scalatest.funsuite.AnyFunSuite

/** GifCodec (encoder) against the JDK's INDEPENDENT GIF reader, the
  * PngCodecSpec discipline inverted: the engine never hand-rolls a GIF
  * decoder — crawled GIFs go through ImageIoCodec — so the encoder is
  * verified by decoding its bytes with javax.imageio and comparing every
  * pixel against the source function. A palette-order bug, an LSB/MSB LZW
  * bit-order mixup, a wrong CLEAR cadence, or a color-table size error all
  * surface as pixel mismatches here (and as hash mismatches at q143).
  */
class GifCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def decodePixels(bytes: Array[Byte]): Array[Array[Int]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO found no reader for the encoded GIF")
    Array.tabulate(img.getHeight, img.getWidth)((y, x) => img.getRGB(x, y) & 0xffffff)
  }

  test("encode -> JDK decode is pixel-exact across sizes, palettes, and the CLEAR cadence") {
    // shapes chosen to cross the interesting boundaries: single pixel,
    // single color (palette 1, min code size floor), 2-4 colors (the
    // 2-literals-per-CLEAR regime), a full 256-color palette (8-bit codes),
    // and widths forcing multi-byte packed streams + sub-block splits
    val cases: Seq[(Int, Int, (Int, Int) => (Int, Int, Int), String)] = Seq(
      (1, 1, (_, _) => (7, 200, 33), "1x1"),
      (5, 3, (_, _) => (250, 1, 128), "single color"),
      (4, 4, (x, y) => if ((x + y) % 2 == 0) (255, 0, 0) else (0, 0, 255), "2-color checker"),
      (8, 4, (x, y) => ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256, (x * 19 + y * 29) % 256), "q143 shape"),
      (16, 16, (x, y) => (x * 16 + y, (x * 16 + y + 85) % 256, (x * 16 + y + 170) % 256), "256 distinct colors"),
      // 100 reds x 2 greens = 200 distinct colors <= 256, 600 pixels ->
      // the packed LZW stream exceeds one 255-byte sub-block
      (300, 2, (x, y) => ((x / 3) % 256, y * 100, 0), "wide row, >255-byte stream"))
    for ((w, h, f, label) <- cases) {
      val px = decodePixels(GifCodec.encode(w, h, f))
      assert(px.length === h && px(0).length === w, label)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = f(x, y)
        val want = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
        assert(px(y)(x) === want, s"$label pixel ($x,$y)")
      }
    }
  }

  test("more than 256 distinct colors fails loudly — GIF is palette-based") {
    // 17x17 with a unique color per pixel = 289 distinct
    val e = intercept[IllegalArgumentException] {
      GifCodec.encode(17, 17, (x, y) => (x, y, x * 17 + y))
    }
    assert(e.getMessage.contains("256"))
  }

  test("cross-codec bit-equality: ImageIO's decode of a GIF == BmpCodec's " +
    "decode of a BMP of the SAME pixels (position-weighted sums)") {
    val f = (x: Int, y: Int) => ((x * 31 + y * 7) % 256, (x * 3 + y * 47) % 256, (x * 13 + y * 5) % 256)
    val viaGif = ImageIoCodec.decode(GifCodec.encode(9, 6, f))
    val viaBmp = BmpCodec.decode(BmpCodec.encode(9, 6, f))
    assert((viaGif.width, viaGif.height) === (viaBmp.width, viaBmp.height))
    assert((viaGif.rSum, viaGif.gSum, viaGif.bSum)
      === (viaBmp.rSum, viaBmp.gSum, viaBmp.bSum),
      "two independent decoders must agree on every weighted channel sum")
  }

  test("the sniffing stage routes GIF blobs like any crawled image (Spark path)") {
    import spark.implicits._
    val media = (0L until 12L).toDF("id").as[Long]
      .mapPartitions(_.map { id =>
        val w = 1 + (id % 4).toInt; val h = 1 + (id % 3).toInt
        (id, GifCodec.encode(w, h,
          (x, y) => (((id + x) % 256).toInt, ((id * 3 + y) % 256).toInt, 40)))
      }).toDF("id", "media")
    val rows = Multimodal.extractImageFeatures(media).collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      assert(r.width === 1 + (r.id % 4).toInt && r.height === 1 + (r.id % 3).toInt)
      val d = ImageIoCodec.decode(GifCodec.encode(r.width, r.height,
        (x, y) => (((r.id + x) % 256).toInt, ((r.id * 3 + y) % 256).toInt, 40)))
      assert((r.r_sum, r.g_sum, r.b_sum) === (d.rSum, d.gSum, d.bSum))
    }
  }
}
