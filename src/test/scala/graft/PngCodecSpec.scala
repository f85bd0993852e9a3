package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.PngCodec
import org.scalatest.funsuite.AnyFunSuite

/** PngCodec against HAND-BUILT fixtures, the BmpCodecSpec discipline: the
  * filter-matrix fixture applies each PNG scanline filter FORWARD in the
  * test (independent arithmetic) and the decoder must reverse it — an
  * encode/decode-symmetric bug cannot cancel out because the encoder only
  * ever emits filter 0. Failure modes must throw, never guess.
  */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Assemble a PNG from IHDR fields and RAW (already filtered) scanline
    * bytes — independent of PngCodec.encode, so a chunk-layout bug there
    * can't leak into the fixtures here.
    */
  private def buildPng(width: Int, height: Int, bitDepth: Int, colorType: Int,
                       interlace: Int, raw: Array[Byte],
                       splitIdat: Boolean = false): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val td = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = out.toByteArray
    // the spec allows the DEFLATE stream to span any number of IDAT chunks
    // at arbitrary split points — exercise a mid-stream split on demand
    val idatChunks =
      if (splitIdat && idat.length >= 2) {
        val cut = idat.length / 2
        chunk("IDAT", idat.take(cut)) ++ chunk("IDAT", idat.drop(cut))
      } else chunk("IDAT", idat)
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0: Byte).put(0: Byte).put(interlace.toByte).array()
    Array[Byte](137.toByte, 80, 78, 71, 13, 10, 26, 10) ++
      chunk("IHDR", ihdr) ++ idatChunks ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Forward-apply a PNG filter to one scanline (prior = reconstructed
    * previous row, empty for row 0) — the spec's encoder direction.
    */
  private def filterRow(filter: Int, recon: Array[Byte], prior: Array[Byte],
                        bpp: Int): Array[Byte] = {
    def u(b: Byte) = b & 0xff
    val out = new Array[Byte](recon.length)
    for (i <- recon.indices) {
      val a = if (i >= bpp) u(recon(i - bpp)) else 0
      val b = if (prior.nonEmpty) u(prior(i)) else 0
      val c = if (prior.nonEmpty && i >= bpp) u(prior(i - bpp)) else 0
      val pred = filter match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      out(i) = ((u(recon(i)) - pred) & 0xff).toByte
    }
    out
  }

  private def weightedSums(px: (Int, Int) => (Int, Int, Int), w: Int, h: Int): (Long, Long, Long) = {
    var (rs, gs, bs) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val wt = 1L + x + y.toLong * w
      val (r, g, b) = px(x, y)
      rs += wt * r; gs += wt * g; bs += wt * b
    }
    (rs, gs, bs)
  }

  test("filter matrix: one scanline per filter type (None/Sub/Up/Average/Paeth), decoder reverses all five") {
    // 2-wide, 5-tall RGB; pixel values chosen to overflow bytes under the
    // filters (so the mod-256 arithmetic is exercised, not just identity)
    val w = 2; val h = 5; val bpp = 3
    val px = (x: Int, y: Int) => ((x * 200 + y * 37) % 256, (x * 90 + y * 150) % 256, (x * 255 + y * 3) % 256)
    val reconRows = (0 until h).map { y =>
      (0 until w).flatMap { x =>
        val (r, g, b) = px(x, y); Seq(r.toByte, g.toByte, b.toByte)
      }.toArray
    }
    val raw = Array.newBuilder[Byte]
    for (y <- 0 until h) {
      val filter = y // row y carries filter type y: 0,1,2,3,4
      raw += filter.toByte
      raw ++= filterRow(filter, reconRows(y),
        if (y == 0) Array.emptyByteArray else reconRows(y - 1), bpp)
    }
    val d = PngCodec.decode(buildPng(w, h, 8, 2, 0, raw.result()))
    val (rs, gs, bs) = weightedSums(px, w, h)
    assert((d.width, d.height, d.colorType) === (w, h, 2))
    assert((d.rSum, d.gSum, d.bSum) === (rs, gs, bs))
  }

  test("the DEFLATE stream split across TWO IDAT chunks decodes identically") {
    val w = 3; val h = 4
    val px = (x: Int, y: Int) => (x * 40, y * 50, (x + y) * 30)
    val recon = (0 until h).map { y =>
      (0 until w).flatMap { x =>
        val (r, g, b) = px(x, y); Seq(r.toByte, g.toByte, b.toByte)
      }.toArray
    }
    val raw = recon.flatMap(row => 0.toByte +: row.toSeq).toArray
    val one = PngCodec.decode(buildPng(w, h, 8, 2, 0, raw))
    val two = PngCodec.decode(buildPng(w, h, 8, 2, 0, raw, splitIdat = true))
    assert(two === one)
  }

  test("grayscale (color type 0) reports the gray value in all three channels") {
    val raw = Array[Byte](0, 10, 250.toByte) // one row, filter 0, pixels 10, 250
    val d = PngCodec.decode(buildPng(2, 1, 8, 0, 0, raw))
    val expected = 1L * 10 + 2L * 250
    assert((d.rSum, d.gSum, d.bSum) === (expected, expected, expected))
    assert(d.colorType === 0)
  }

  test("RGBA (color type 6): alpha must unfilter (Sub over 4-byte pixels) but is not summed") {
    // two pixels, filter 1 (Sub) with bpp 4 — a decoder using bpp 3 here
    // would reconstruct garbage in every channel
    val p0 = Array[Byte](100, 50, 25, 200.toByte)
    val p1 = Array[Byte](110, 60, 35, 210.toByte)
    val recon = p0 ++ p1
    val raw = Array[Byte](1) ++ filterRow(1, recon, Array.emptyByteArray, 4)
    val d = PngCodec.decode(buildPng(2, 1, 8, 6, 0, raw))
    assert(d.rSum === 1L * 100 + 2L * 110)
    assert(d.gSum === 1L * 50 + 2L * 60)
    assert(d.bSum === 1L * 25 + 2L * 35)
  }

  test("encode round-trips through decode at every small size") {
    for (w <- 1 to 6; h <- Seq(1, 2, 5)) {
      val px = (x: Int, y: Int) => ((x * 5 + y * 17) % 256, (x * 3 + 7) % 256, (y * 7 + 100) % 256)
      val d = PngCodec.decode(PngCodec.encode(w, h, px))
      val (rs, gs, bs) = weightedSums(px, w, h)
      assert((d.width, d.height, d.rSum, d.gSum, d.bSum) === (w, h, rs, gs, bs),
        s"mismatch at ${w}x$h")
    }
  }

  test("decode fails loudly: bad signature, bad CRC, unsupported variants, size lies, bad filter") {
    val ok = PngCodec.encode(2, 2, (x, y) => (x * 10, y * 10, 40))
    // bad signature
    val badSig = ok.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](PngCodec.decode(badSig))
    // flipped byte inside IDAT payload without fixing the CRC
    val badCrc = ok.clone(); badCrc(8 + 25 + 12) = (badCrc(8 + 25 + 12) ^ 0x5a).toByte
    val eCrc = intercept[IllegalArgumentException](PngCodec.decode(badCrc))
    assert(eCrc.getMessage.contains("CRC"))
    // 16-bit depth / palette color / interlace all refused
    val raw1x1 = Array[Byte](0, 1, 2, 3)
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(1, 1, 16, 2, 0, raw1x1)))
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(1, 1, 8, 3, 0, raw1x1)))
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(1, 1, 8, 2, 1, raw1x1)))
    // DEFLATE stream shorter than IHDR's declared pixel volume
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(4, 4, 8, 2, 0, raw1x1)))
    // ...and longer (forged dims must not silently drop pixels)
    val tooLong = Array[Byte](0, 1, 2, 3, 9, 9, 9)
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(1, 1, 8, 2, 0, tooLong)))
    // a filter type outside 0..4
    val badFilter = Array[Byte](9, 1, 2, 3)
    intercept[IllegalArgumentException](PngCodec.decode(buildPng(1, 1, 8, 2, 0, badFilter)))
    // truncated chunk stream
    intercept[IllegalArgumentException](PngCodec.decode(ok.take(ok.length - 6)))
  }

  test("extractPngFeatures: distributed decode matches the local decoder and is partition-invariant") {
    import spark.implicits._
    val ids = (0L until 40L)
    val media = ids.map { id =>
      val w = 1 + (id % 7).toInt
      val h = 1 + (id % 4).toInt
      (id, PngCodec.encode(w, h, (x, y) => (
        ((id * 31 + x * 7 + y * 13) % 256).toInt,
        ((id * 17 + x * 11 + y * 5) % 256).toInt,
        ((id * 29 + x * 3 + y * 19) % 256).toInt)))
    }
    val df = media.toDF("id", "media")
    val got = Multimodal.extractPngFeatures(df.repartition(7)).toDF()
      .orderBy("id")
      .as[(Long, Long, Int, Int, Int, Long, Long, Long)].collect().toSeq
    val expected = media.map { case (id, bytes) =>
      val d = PngCodec.decode(bytes)
      (id, bytes.length.toLong, d.width, d.height, d.colorType, d.rSum, d.gSum, d.bSum)
    }
    assert(got === expected)
  }
}
