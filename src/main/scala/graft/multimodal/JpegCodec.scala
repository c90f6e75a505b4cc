package graft.multimodal

/** Pure-JDK baseline-sequential JPEG decoder (ITU-T T.81 Annex F): marker
  * walk, DQT/DHT/SOF0/SOF1/DRI/SOS, canonical Huffman entropy decode with
  * byte-stuffing and restart markers, dequantize, float separable IDCT,
  * libjpeg-style triangular ("fancy") chroma upsampling, and JFIF
  * YCbCr→RGB. This closes the last declared multimodal seam — PNG, BMP
  * and JPEG are all real bytes-in/pixels-out paths with no codec library.
  *
  * Scope (checked, loudly rejected otherwise): 8-bit precision, baseline
  * or extended-sequential Huffman (SOF0/SOF1), 1- or 3-component scans,
  * sampling factors 1-2 per axis. Progressive (SOF2), arithmetic coding,
  * 12-bit, and CMYK are out of scope and return Left — the same
  * declared-subset contract the PNG/BMP decoders follow.
  *
  * Accuracy contract (MultimodalSpec): decoded samples sit within ±2 of
  * `javax.imageio`'s libjpeg output on every golden image, and DC-only
  * blocks (flat 8×8 tiles, quant 1) reconstruct bit-exactly — the
  * property [[MultimodalOps.qMmJpegDecode]]'s DuckDB oracle relies on.
  */
object JpegCodec {
  import ImageCodec.Image

  /** Thrown internally for malformed streams; surfaced as Left. */
  private final class Corrupt(val reason: String) extends RuntimeException(reason)
  private def corrupt(reason: String): Nothing = throw new Corrupt(reason)

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable IDCT basis: M(x)(u) = C(u)/2 · cos((2x+1)uπ/16). A DC-only
    * block reconstructs to DC·M(x)(0)·M(y)(0) = DC/8 up to one double ulp,
    * so flat quant-1 tiles round back bit-exactly. */
  private val IdctM: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) math.sqrt(0.5) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table (T.81 F.2.2.3 DECODE procedure). */
  private final class HuffTable(counts: Array[Int], val values: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k; minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-stream bit reader: handles 0xFF00 byte stuffing; any other
    * marker inside the stream is structural corruption for a baseline
    * decoder that tracks MCU counts itself (restarts are consumed at MCU
    * boundaries by [[syncRestart]], never here). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= bytes.length) corrupt("entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) corrupt("entropy stream truncated at FF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else corrupt(f"unexpected marker FF$m%02x inside entropy data")
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >>> bitCnt) & 1
    }

    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker. */
    def syncRestart(expected: Int): Unit = {
      bitCnt = 0
      if (pos + 2 > bytes.length) corrupt("truncated at restart")
      if ((bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xff) != (0xd0 + expected))
        corrupt(f"expected RST$expected%d, found ${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = r.nextBit()
    var len = 1
    while (code > t.maxCode(len)) {
      code = (code << 1) | r.nextBit()
      len += 1
      if (len > 16) corrupt("invalid Huffman code")
    }
    val idx = t.valPtr(len) + code - t.minCode(len)
    if (idx < 0 || idx >= t.values.length) corrupt("Huffman index out of range")
    t.values(idx)
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var pred: Int = 0
    var blocksW: Int = 0
    var blocksH: Int = 0
    var plane: Array[Int] = _ // blocksW*8 x blocksH*8 samples, 0..255
  }

  /** Decode one 8×8 block: Huffman DC diff + AC run-lengths, dequantize
    * into natural order, float IDCT, level-shift + clamp into the
    * component plane at (bx, by). */
  private def decodeBlock(r: BitReader, c: Component, qt: Array[Int],
      coef: Array[Double], tmp: Array[Double], bx: Int, by: Int): Unit = {
    java.util.Arrays.fill(coef, 0.0)
    val s = decodeHuff(r, c.dcTab)
    if (s > 11) corrupt(s"DC magnitude $s out of range")
    c.pred += extend(r.receive(s), s)
    coef(0) = c.pred.toDouble * qt(0)
    var k = 1
    while (k < 64) {
      val rs = decodeHuff(r, c.acTab)
      val run = rs >>> 4; val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += run
        if (k > 63) corrupt("AC run past block end")
        coef(Zigzag(k)) = extend(r.receive(size), size).toDouble * qt(k)
        k += 1
      }
    }
    // rows: tmp(y*8+x) = sum_u coef(y*8+u) * M(x)(u); then columns
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += coef(y * 8 + u) * IdctM(x)(u); u += 1 }
        tmp(y * 8 + x) = acc
        x += 1
      }
      y += 1
    }
    val pw = c.blocksW * 8
    val x0 = bx * 8; val y0 = by * 8
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0; var v = 0
        while (v < 8) { acc += tmp(v * 8 + x) * IdctM(yy)(v); v += 1 }
        val px = Math.round(acc + 128.0).toInt
        c.plane((y0 + yy) * pw + x0 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  /** libjpeg-style triangular upsample of one axis-2 factor, or nearest
    * for the remaining (1x, and any unusual) ratios; crops to w×h. */
  private def upsample(c: Component, hmax: Int, vmax: Int, w: Int, h: Int): Array[Int] = {
    val pw = c.blocksW * 8; val ph = c.blocksH * 8
    val sw = (w * c.h + hmax - 1) / hmax // valid source extent (pre-crop)
    val sh = (h * c.v + vmax - 1) / vmax
    val rx = hmax / c.h; val ry = vmax / c.v
    if (rx == 1 && ry == 1 && pw == w && ph == h) return c.plane
    val out = new Array[Int](w * h)
    val src = c.plane
    def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= sw) sw - 1 else x
      val cy = if (y < 0) 0 else if (y >= sh) sh - 1 else y
      src(cy * pw + cx)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (rx == 2 && ry == 2 && hmax % 2 == 0 && vmax % 2 == 0) {
            // h2v2 fancy: 9/16 near + 3/16 + 3/16 + 1/16 far, jdsample rounding
            val sx = x >> 1; val sy = y >> 1
            val dx = if ((x & 1) == 0) -1 else 1
            val dy = if ((y & 1) == 0) -1 else 1
            val thiscol = 3 * at(sx, sy) + at(sx, sy + dy)
            val nextcol = 3 * at(sx + dx, sy) + at(sx + dx, sy + dy)
            if ((x & 1) == 0) (3 * thiscol + nextcol + 8) >> 4
            else (3 * thiscol + nextcol + 7) >> 4
          } else if (rx == 2 && ry == 1) {
            val sx = x >> 1
            val dx = if ((x & 1) == 0) -1 else 1
            if ((x & 1) == 0) (3 * at(sx, y) + at(sx + dx, y) + 1) >> 2
            else (3 * at(sx, y) + at(sx + dx, y) + 2) >> 2
          } else if (rx == 1 && ry == 2) {
            val sy = y >> 1
            val dy = if ((y & 1) == 0) -1 else 1
            if ((y & 1) == 0) (3 * at(x, sy) + at(x, sy + dy) + 1) >> 2
            else (3 * at(x, sy) + at(x, sy + dy) + 2) >> 2
          } else at(x * c.h / hmax, y * c.v / vmax) // nearest (incl. 2x2 crops)
        out(y * w + x) = v
        x += 1
      }
      y += 1
    }
    out
  }

  private def u16(bytes: Array[Byte], i: Int): Int =
    ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

  /** Decode a baseline/extended-sequential JPEG. Left(reason) for
    * anything outside scope or structurally broken — never throws. */
  def decode(bytes: Array[Byte]): Either[String, Image] =
    try decodeOrThrow(bytes)
    catch {
      case e: Corrupt => Left(s"jpeg: ${e.reason}")
      case e: ArrayIndexOutOfBoundsException => Left(s"jpeg: truncated (${e.getMessage})")
    }

  private def decodeOrThrow(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return Left("not a JPEG")
    val quant = new Array[Array[Int]](4) // zigzag-order tables
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2

    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return Left("jpeg: marker desync")
      var marker = bytes(i + 1) & 0xff
      var mi = i + 1
      while (marker == 0xff && mi + 1 < bytes.length) { mi += 1; marker = bytes(mi) & 0xff } // fill bytes
      i = mi + 1
      marker match {
        case 0xd9 => return Left("jpeg: EOI before SOS") // handled post-scan below
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside a scan
          return Left("jpeg: RST outside scan")
        case 0x01 => // TEM, parameterless
        case _ =>
          if (i + 2 > bytes.length) return Left("jpeg: truncated segment length")
          val len = u16(bytes, i)
          if (len < 2 || i + len > bytes.length) return Left("jpeg: bad segment length")
          val seg = i + 2; val segEnd = i + len
          marker match {
            case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
              if (comps != null) return Left("jpeg: multiple frames")
              if (segEnd - seg < 6) return Left("jpeg: short SOF")
              val precision = bytes(seg) & 0xff
              if (precision != 8) return Left(s"jpeg: unsupported precision $precision")
              h = u16(bytes, seg + 1); w = u16(bytes, seg + 3)
              val nc = bytes(seg + 5) & 0xff
              if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return Left("jpeg: bad dimensions")
              if (nc != 1 && nc != 3) return Left(s"jpeg: unsupported component count $nc")
              if (segEnd - seg < 6 + 3 * nc) return Left("jpeg: short SOF")
              comps = Array.tabulate(nc) { k =>
                val o = seg + 6 + 3 * k
                val hv = bytes(o + 1) & 0xff
                val c = new Component(bytes(o) & 0xff, hv >>> 4, hv & 15, bytes(o + 2) & 0xff)
                if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)
                  return Left(s"jpeg: unsupported sampling ${c.h}x${c.v}")
                if (c.tq > 3) return Left("jpeg: bad quant table id")
                c
              }
            case m2 if m2 >= 0xc2 && m2 <= 0xcf && m2 != 0xc4 && m2 != 0xc8 && m2 != 0xcc =>
              return Left(f"jpeg: unsupported frame type SOF${m2 - 0xc0}%d (progressive/arithmetic/lossless)")
            case 0xdb => // DQT
              var p = seg
              while (p < segEnd) {
                val pq = (bytes(p) & 0xff) >>> 4; val tq = bytes(p) & 15
                if (tq > 3 || pq > 1) return Left("jpeg: bad DQT header")
                val n = if (pq == 0) 64 else 128
                if (p + 1 + n > segEnd) return Left("jpeg: truncated DQT")
                quant(tq) = Array.tabulate(64)(k =>
                  if (pq == 0) bytes(p + 1 + k) & 0xff else u16(bytes, p + 1 + 2 * k))
                p += 1 + n
              }
            case 0xc4 => // DHT
              var p = seg
              while (p < segEnd) {
                if (p + 17 > segEnd) return Left("jpeg: truncated DHT")
                val tc = (bytes(p) & 0xff) >>> 4; val th = bytes(p) & 15
                if (tc > 1 || th > 3) return Left("jpeg: bad DHT header")
                val counts = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
                val total = counts.sum
                if (total > 256 || p + 17 + total > segEnd) return Left("jpeg: bad DHT counts")
                val values = Array.tabulate(total)(k => bytes(p + 17 + k) & 0xff)
                val t = new HuffTable(counts, values)
                if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                p += 17 + total
              }
            case 0xdd => // DRI
              if (segEnd - seg < 2) return Left("jpeg: short DRI")
              restartInterval = u16(bytes, seg)
            case 0xda => // SOS — decode the scan, then finish
              if (comps == null) return Left("jpeg: SOS before SOF")
              val ns = bytes(seg) & 0xff
              if (ns != comps.length) return Left("jpeg: partial scans unsupported")
              if (segEnd - seg < 1 + 2 * ns + 3) return Left("jpeg: short SOS")
              var k = 0
              while (k < ns) {
                val cid = bytes(seg + 1 + 2 * k) & 0xff
                val tabs = bytes(seg + 2 + 2 * k) & 0xff
                val c = comps.find(_.id == cid).getOrElse(return Left("jpeg: SOS references unknown component"))
                val dt = dcTabs((tabs >>> 4) & 3); val at2 = acTabs(tabs & 3)
                if (dt == null || at2 == null) return Left("jpeg: SOS references missing Huffman table")
                c.dcTab = dt; c.acTab = at2
                k += 1
              }
              comps.foreach { c =>
                if (quant(c.tq) == null) return Left("jpeg: missing quant table")
              }
              return decodeScan(bytes, segEnd, comps, quant, w, h, restartInterval)
            case _ => // APPn / COM / others: skip
          }
          i = segEnd
      }
    }
    Left("jpeg: no SOS marker")
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, frameComps: Array[Component],
      quant: Array[Array[Int]], w: Int, h: Int, restartInterval: Int): Either[String, Image] = {
    // T.81 A.2: a single-component scan is NON-interleaved — one data
    // unit per MCU, block counts from the component's own dimensions.
    // Declared sampling factors are meaningless in a one-component frame
    // (libjpeg effectively ignores them); honoring them would desync the
    // MCU walk on a grayscale JPEG declaring e.g. 2x2 factors. Use a
    // CORRECTED COPY so the frame's declared metadata stays immutable.
    val comps =
      if (frameComps.length == 1 && (frameComps(0).h != 1 || frameComps(0).v != 1)) {
        val c = frameComps(0)
        val c1 = new Component(c.id, 1, 1, c.tq)
        c1.dcTab = c.dcTab; c1.acTab = c.acTab
        Array(c1)
      } else frameComps
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.blocksW = mcusX * c.h
      c.blocksH = mcusY * c.v
      c.plane = new Array[Int](c.blocksW * 8 * c.blocksH * 8)
    }
    val r = new BitReader(bytes, scanStart)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.syncRestart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            decodeBlock(r, c, qt, coef, tmp, mx * c.h + bx, my * c.v + by)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val plane = upsample(comps(0), hmax, vmax, w, h)
      val px = new Array[Byte](w * h)
      var k = 0
      while (k < px.length) { px(k) = plane(k).toByte; k += 1 }
      Right(Image(w, h, 1, px))
    } else {
      val yP = upsample(comps(0), hmax, vmax, w, h)
      val cbP = upsample(comps(1), hmax, vmax, w, h)
      val crP = upsample(comps(2), hmax, vmax, w, h)
      val px = new Array[Byte](w * h * 3)
      var k = 0
      while (k < w * h) {
        val y = yP(k).toDouble
        val cb = cbP(k) - 128.0
        val cr = crP(k) - 128.0
        def clamp(d: Double): Byte = {
          val v = Math.round(d).toInt
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        }
        px(3 * k) = clamp(y + 1.402 * cr)
        px(3 * k + 1) = clamp(y - 0.344136 * cb - 0.714136 * cr)
        px(3 * k + 2) = clamp(y + 1.772 * cb)
        k += 1
      }
      Right(Image(w, h, 3, px))
    }
  }
}
