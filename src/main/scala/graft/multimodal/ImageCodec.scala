package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JDK image container codecs: PNG (zlib `Deflater`/`Inflater` +
  * the five scanline filters) and uncompressed BMP. No codec library —
  * everything here is the container spec implemented directly, which is
  * what makes the decode path REAL rather than a stub: bytes in, pixels
  * out, golden-checked against `javax.imageio` in MultimodalSpec.
  *
  * Logical raster convention (both formats, encode and decode): row-major,
  * top-down, samples in R,G,B[,A] (or gray) order — the layout a
  * downstream feature extractor wants, independent of each container's
  * physical quirks (PNG per-row filters, BMP bottom-up BGR with 4-byte row
  * padding).
  *
  * Scope (documented, checked, loudly rejected otherwise): PNG bit depth
  * 8, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced —
  * i.e. what `ImageIO`'s own PNG writer emits for 8-bit images; BMP
  * `BI_RGB` 24/32-bit; JPEG baseline/extended-sequential Huffman via
  * [[JpegCodec]] (the DCT entropy decoder that used to be the declared
  * seam — now real).
  */
object ImageCodec {

  /** Decoded image: `pixels.length == width * height * channels`. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  // ---- PNG ----

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0 // grayscale
    case 2 => 4 // gray + alpha
    case 3 => 2 // RGB
    case 4 => 6 // RGBA
    case c => throw new IllegalArgumentException(s"PNG: unsupported channel count $c")
  }

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1); case 2 => Some(3); case 4 => Some(2); case 6 => Some(4)
    case _ => None // 3 = palette: out of scope
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val typB = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(typB); crc.update(data)
    out.write(typB)
    out.write(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode to PNG. Each row carries filter type `y % 5`, so one image
    * exercises ALL five filters (None/Sub/Up/Average/Paeth) — an encode →
    * decode roundtrip that passes proves the whole unfilter kernel, not
    * just the path a particular writer happens to prefer. */
  def encodePng(img: Image): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(px.length == w * h * ch, s"raster size ${px.length} != $w*$h*$ch")
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      for (i <- 0 until stride) {
        val x = px(y * stride + i) & 0xff
        val a = if (i >= ch) px(y * stride + i - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) px((y - 1) * stride + i - ch) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + i) = f.toByte
      }
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType(ch).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
      .array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a non-interlaced 8-bit PNG (color types 0/2/4/6). Returns
    * Left(reason) for anything outside that scope or structurally broken —
    * callers decide whether that is an error or a fallback. */
  def decodePng(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < 8 || !bytes.take(8).sameElements(PngSig)) return Left("not a PNG")
    val buf = ByteBuffer.wrap(bytes)
    var i = 8
    var w = 0; var h = 0; var ch = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= bytes.length) {
      val len = buf.getInt(i)
      if (len < 0 || i.toLong + 12 + len > bytes.length) return Left("truncated chunk")
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len != 13) return Left("bad IHDR length")
          w = buf.getInt(i + 8); h = buf.getInt(i + 12)
          val depth = bytes(i + 16) & 0xff
          val ct = bytes(i + 17) & 0xff
          val interlace = bytes(i + 20) & 0xff
          if (depth != 8) return Left(s"unsupported bit depth $depth")
          if (interlace != 0) return Left("interlaced PNG unsupported")
          ch = channelsOf(ct).getOrElse(return Left(s"unsupported color type $ct"))
          if (w <= 0 || h <= 0 || w.toLong * h * ch > (1L << 30)) return Left("bad dimensions")
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks (tEXt, gAMA, ...) are skippable by design
      }
      i += 12 + len
    }
    if (ch < 0) return Left("missing IHDR")
    // a stream cut exactly between the last IDAT and IEND carries all the
    // pixel data but is still a truncated transfer — only the IEND marker
    // distinguishes it, so its absence is an error, not leniency
    if (!sawEnd) return Left("missing IEND")
    if (idat.size == 0) return Left("missing IDAT")

    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return Left("truncated IDAT stream")
        off += n
      }
    } catch { case e: java.util.zip.DataFormatException => return Left(s"zlib: ${e.getMessage}") }
    finally inflater.end()
    if (off < raw.length) return Left("short pixel stream")

    val px = new Array[Byte](h * stride)
    for (y <- 0 until h) {
      val ft = raw(y * (1 + stride)) & 0xff
      for (i2 <- 0 until stride) {
        val f = raw(y * (1 + stride) + 1 + i2) & 0xff
        val a = if (i2 >= ch) px(y * stride + i2 - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i2) & 0xff else 0
        val c = if (y > 0 && i2 >= ch) px((y - 1) * stride + i2 - ch) & 0xff else 0
        val x = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paeth(a, b, c)
          case other => return Left(s"bad filter type $other")
        }
        px(y * stride + i2) = x.toByte
      }
    }
    Right(Image(w, h, ch, px))
  }

  // ---- BMP (BI_RGB, 24-bit encode; 24/32-bit decode) ----

  /** Encode to a 24-bit uncompressed BMP (`BI_RGB`): bottom-up rows, BGR
    * sample order, rows padded to 4 bytes — the container's physical
    * layout, mapped from the logical top-down RGB raster. */
  def encodeBmp(img: Image): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(ch == 3, s"BMP encoder is 24-bit RGB only, got $ch channels")
    require(px.length == w * h * ch, s"raster size ${px.length} != $w*$h*$ch")
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val out = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel data offset
    out.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, positive h = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val p = (y * w + x) * 3
        out.put(px(p + 2)).put(px(p + 1)).put(px(p)) // RGB -> BGR
      }
      var pad = w * 3
      while ((pad & 3) != 0) { out.put(0.toByte); pad += 1 }
    }
    out.array()
  }

  /** Decode an uncompressed (`BI_RGB`) 24- or 32-bit BMP. Honors both
    * bottom-up (positive height) and top-down (negative height) storage. */
  def decodeBmp(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return Left("not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val headerSize = buf.getInt(14)
    if (headerSize < 40) return Left(s"unsupported header size $headerSize")
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (compression != 0) return Left(s"unsupported compression $compression")
    if (bpp != 24 && bpp != 32) return Left(s"unsupported bpp $bpp")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return Left("bad dimensions")
    val ch = if (bpp == 24) 3 else 4
    val rowSize = (w * (bpp / 8) + 3) & ~3
    // dataOff below the two headers (or negative from a corrupt i32) would
    // pass a pure upper-bound check and index before the array start
    if (dataOff < 54) return Left(s"bad pixel data offset $dataOff")
    if (dataOff.toLong + rowSize.toLong * h > bytes.length) return Left("truncated pixel data")
    val px = new Array[Byte](w * h * ch)
    for (row <- 0 until h) {
      val srcRow = if (topDown) row else h - 1 - row
      val src = dataOff + srcRow * rowSize
      for (x <- 0 until w) {
        val s = src + x * (bpp / 8)
        val d = (row * w + x) * ch
        px(d) = bytes(s + 2)     // B,G,R[,A] -> R
        px(d + 1) = bytes(s + 1) // -> G
        px(d + 2) = bytes(s)     // -> B
        if (ch == 4) px(d + 3) = bytes(s + 3)
      }
    }
    Right(Image(w, h, ch, px))
  }

  /** Decode by container sniffing: PNG signature, BMP magic, JPEG SOI. */
  def decode(bytes: Array[Byte]): Either[String, Image] =
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) decodePng(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      JpegCodec.decode(bytes)
    else Left("unrecognized container")
}
