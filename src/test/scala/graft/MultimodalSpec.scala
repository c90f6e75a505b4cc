package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Multimodal binary plumbing (SURVEY.md §2.E): partition-batched decode
  * with a stubbed kernel — results must not depend on partitioning. */
class MultimodalSpec extends SparkSpec {

  test("batched decode output is independent of partition layout") {
    val base = Tables.documents(spark, SfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val one = MultimodalOps.decodeInBatches(base.repartition(1), 32)
      .drop("batch_size").orderBy("doc_id").collect().toSeq
    val many = MultimodalOps.decodeInBatches(base.repartition(13), 7)
      .drop("batch_size").orderBy("doc_id").collect().toSeq
    assert(one == many)
  }

  test("batches never exceed the requested size") {
    val base = Tables.documents(spark, SfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val sizes = MultimodalOps.decodeInBatches(base.repartition(3), 32)
      .select("batch_size").distinct().collect().map(_.getInt(0))
    assert(sizes.forall(s => s >= 1 && s <= 32))
  }

  test("header decode reads real PNG and JPEG dimensions") {
    // minimal PNG: signature + IHDR length/type + 640x480 dims
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* width 640 */ 0, 0, 0x01, 0xe0 /* height 480 */,
      8, 6, 0, 0, 0).map(_.toByte)
    assert(MultimodalOps.decodeHeader(png) == ((640, 480, 1)))
    // minimal JPEG: SOI + APP0 (len 4) + SOF0 with 240x320 (height first)
    val jpg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0xf0, 0x01, 0x40, 0x01, 0x00).map(_.toByte)
    assert(MultimodalOps.decodeHeader(jpg) == ((320, 240, 1)))
    // non-image payload falls back to the deterministic stub
    val other = "plain text".getBytes("UTF-8")
    assert(MultimodalOps.decodeHeader(other) == MultimodalOps.decodeHeader(other))
  }

  test("decode features match a driver-side recomputation of the raster") {
    val rows = MultimodalOps.qMmDecode(spark, SfDir).limit(60).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (_, img, _) = MultimodalOps.syntheticImage(id)
      val samples = img.pixels.map(_ & 0xff)
      assert(r.getString(1) == (if (id % 4 == 3) "bmp" else "png"))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((img.width.toLong, img.height.toLong, img.channels.toLong)))
      assert(r.getLong(5) == samples.min.toLong, s"doc $id sample_min")
      assert(r.getLong(6) == samples.max.toLong, s"doc $id sample_max")
      (0 until 4).foreach { b =>
        assert(r.getLong(7 + b) == samples.count(_ >> 6 == b).toLong,
          s"doc $id hist_$b")
      }
    }
  }

  test("fit-box arithmetic preserves aspect and never upscales") {
    for (w <- 1 to 40; h <- 1 to 20) {
      val (ow, oh) = MultimodalOps.fitBox(w, h, 8, 8)
      assert(ow >= 1 && oh >= 1 && ow <= math.min(w, 8) && oh <= math.min(h, 8))
      if (w >= h) assert(ow >= oh) else assert(oh >= ow)
      // already-fitting images pass through untouched
      if (w <= 8 && h <= 8) assert((ow, oh) == ((w, h)))
    }
  }

  test("box resample matches a naive per-cell average and keeps mass ordering") {
    val img = testImage(17, 9, 3, 21)
    val out = MultimodalOps.resampleBox(img, 8, 4)
    assert((out.width, out.height, out.channels) == ((8, 4, 3)))
    // recompute each output sample by the forward floor mapping
    for (oy <- 0 until 4; ox <- 0 until 8; c <- 0 until 3) {
      val cell = for {
        sy <- 0 until 9 if sy * 4 / 9 == oy
        sx <- 0 until 17 if sx * 8 / 17 == ox
      } yield img.pixels((sy * 17 + sx) * 3 + c) & 0xff
      val want = cell.map(_.toLong).sum / cell.length
      val got = out.pixels((oy * 8 + ox) * 3 + c) & 0xff
      assert(got == want, s"cell ($ox,$oy) ch $c: $got != $want")
    }
    // a flat image resamples to the same flat value
    val flat = graft.multimodal.ImageCodec.Image(16, 8, 1, Array.fill(128)(93.toByte))
    assert(MultimodalOps.resampleBox(flat, 5, 3).pixels.forall(_ == 93.toByte))
  }

  test("frame container walk recovers every frame; sampling keeps even indices") {
    for (id <- Seq(0L, 1L, 6L, 13L)) {
      val container = MultimodalOps.buildFrameContainer(id)
      val frames = MultimodalOps.splitFrames(container)
        .fold(e => fail(s"doc $id: $e"), identity)
      assert(frames.length == 2 + (id % 7).toInt, s"doc $id frame count")
      // each recovered frame is an independently decodable BMP whose
      // raster matches the defining arithmetic
      frames.zipWithIndex.foreach { case (bytes, f) =>
        val img = graft.multimodal.ImageCodec.decodeBmp(bytes)
          .fold(e => fail(s"frame $f: $e"), img => img)
        assert(img.width == 4 + (id % 3).toInt * 4 && img.height == 4)
        img.pixels.zipWithIndex.foreach { case (b, k) =>
          assert((b & 0xff) == ((id * 31 + f * 7 + k) % 256).toInt)
        }
      }
      // truncation and trailing garbage are loud Lefts, not misparses
      assert(MultimodalOps.splitFrames(container.dropRight(3)).isLeft)
      assert(MultimodalOps.splitFrames(container ++ Array[Byte](1, 2, 3)).isLeft)
    }
    // the registered query keeps exactly the even frame indices
    val sampled = MultimodalOps.qMmFrameSample(spark, SfDir)
      .select("doc_id", "frame_idx").collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.map(_.getLong(1)).sorted.toSeq }
    sampled.take(20).foreach { case (id, idxs) =>
      assert(idxs == (0L until (2 + id % 7) by 2L).toSeq, s"doc $id sampled $idxs")
    }
  }

  test("scene-cut detection flags exactly the scene boundaries") {
    val rows = MultimodalOps.qMmSceneCut(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length == 8, s"doc $id: ${rs.length} adjacent pairs for 9 frames")
      // scenes are frames {0,1,2},{3,4,5},{6,7,8}: cuts at 2->3 and 5->6
      val cuts = rs.filter(_.getBoolean(5)).map(_.getLong(1)).sorted.toSeq
      assert(cuts == Seq(2L, 5L), s"doc $id flagged cuts at $cuts")
    }
    // diff_sum matches a driver-side recompute from the raster arithmetic
    rows.filter(_.getLong(0) < 5).foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1).toInt)
      val want = (0 until 96).map { k =>
        val a = (id * 31 + (f / 3) * 1000 + (f % 3) * 7 + k) % 256
        val b = (id * 31 + ((f + 1) / 3) * 1000 + ((f + 1) % 3) * 7 + k) % 256
        math.abs(a - b)
      }.sum
      assert(r.getLong(4) == want, s"doc $id pair $f: ${r.getLong(4)} != $want")
    }
  }

  test("binary stats match the payload bytes") {
    val row = MultimodalOps.qMmBinaryStats(spark, SfDir).head()
    val text = Tables.documents(spark, SfDir)
      .filter(col("doc_id") === row.getLong(0)).select("text").head().getString(0)
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
  }

  test("WAV builder/parser round-trip, chunk walking, and rejection") {
    val data = Array.tabulate(1001)(_.toByte) // odd length → data chunk pads
    val wav = MultimodalOps.buildWav(44100, 2, 16, data)
    assert(MultimodalOps.parseWavHeader(wav).contains((44100, 2, 16, 1001L)))
    // the walker must skip an unknown odd-sized chunk BEFORE fmt/data
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    // fix up the RIFF size for the added chunk
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + extra.length + data.length)
    assert(MultimodalOps.parseWavHeader(spliced).contains((44100, 2, 16, 1001L)))
    assert(MultimodalOps.parseWavHeader("not audio at all".getBytes).isEmpty)
    assert(MultimodalOps.parseWavHeader(wav.take(20)).isEmpty) // truncated
  }

  test("audio energy decodes signed PCM correctly even behind extra chunks") {
    // a hand-built stereo signal with known samples: frame f carries
    // (+f*3, -f*3) — energy and peak are exactly computable
    val ch = 2; val frames = 128
    val data = new Array[Byte](frames * ch * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (f <- 0 until frames) { bb.putShort((f * 3).toShort); bb.putShort((-f * 3).toShort) }
    val wav = MultimodalOps.buildWav(16000, ch, 16, data)
    // splice an unknown chunk BEFORE data: the offset must come from the
    // walk, not a fixed-44 assumption
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + extra.length + data.length)
    val (_, pCh, bits, off, len) = MultimodalOps.parseWavChunks(spliced).get
    assert((pCh, bits, len) == ((2, 16, data.length.toLong)))
    // decode samples from the walked offset and check both channels
    for (f <- 0 until frames; c <- 0 until ch) {
      val p = off + (f * ch + c) * 2
      val v = (spliced(p) & 0xff) | (spliced(p + 1) << 8)
      val want = if (c == 0) f * 3 else -f * 3
      assert(v == want, s"frame $f ch $c: $v != $want")
    }
    // and the registered query matches a driver-side recompute
    val rows = MultimodalOps.qMmAudioEnergy(spark, SfDir).limit(40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, c, w) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)
      val nCh = 1 + (id % 2).toInt
      var sumSq = 0L; var peak = 0L
      for (j <- 0 until 64) {
        val s = ((w * 64 + j) * nCh + c) * 2
        val raw = ((id * 31 + s) % 256 + 256 * ((id * 31 + s + 1) % 256)).toInt
        val v = if (raw >= 32768) raw - 65536 else raw
        sumSq += v.toLong * v; peak = math.max(peak, math.abs(v).toLong)
      }
      assert(r.getLong(4) == sumSq, s"doc $id ch $c win $w sum_sq")
      assert(r.getLong(5) == peak, s"doc $id ch $c win $w peak")
    }
  }

  // ---- real pixel decode (ImageCodec) ----

  import graft.multimodal.ImageCodec
  import java.awt.image.BufferedImage
  import javax.imageio.ImageIO

  /** Deterministic raster for codec tests. */
  private def testImage(w: Int, h: Int, ch: Int, seed: Int): ImageCodec.Image =
    ImageCodec.Image(w, h, ch,
      Array.tabulate(w * h * ch)(k => ((seed * 31 + k * 7) % 256).toByte))

  test("PNG encode→decode round-trips every filter type and channel count") {
    // encodePng cycles filter y % 5, so any h >= 5 exercises all five
    // filters; channel counts cover gray / gray+alpha / RGB / RGBA
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 7), (16, 9), (31, 5))) {
      val img = testImage(w, h, ch, ch * 100 + w)
      val decoded = ImageCodec.decodePng(ImageCodec.encodePng(img))
        .fold(e => fail(s"ch=$ch $w x $h: $e"), identity)
      assert(decoded.width == w && decoded.height == h && decoded.channels == ch)
      assert(decoded.pixels.sameElements(img.pixels), s"pixels drifted ch=$ch $w x $h")
    }
  }

  test("BMP encode→decode round-trips (bottom-up rows, BGR, padding)") {
    // widths chosen so row padding hits 0/1/2/3 pad bytes
    for (w <- Seq(1, 2, 3, 4, 17); h <- Seq(1, 6)) {
      val img = testImage(w, h, 3, w * 10 + h)
      val decoded = ImageCodec.decodeBmp(ImageCodec.encodeBmp(img))
        .fold(e => fail(s"$w x $h: $e"), identity)
      assert((decoded.width, decoded.height, decoded.channels) == ((w, h, 3)))
      assert(decoded.pixels.sameElements(img.pixels), s"pixels drifted $w x $h")
    }
  }

  test("our PNG/BMP bytes are golden-readable by javax.imageio, pixel-exact") {
    def argbAt(img: ImageCodec.Image, x: Int, y: Int): Int = {
      val p = (y * img.width + x) * img.channels
      def u(i: Int) = img.pixels(p + i) & 0xff
      img.channels match {
        case 1 => 0xff000000 | (u(0) << 16) | (u(0) << 8) | u(0)
        case 3 => 0xff000000 | (u(0) << 16) | (u(1) << 8) | u(2)
        case 4 => (u(3) << 24) | (u(0) << 16) | (u(1) << 8) | u(2)
      }
    }
    val cases = Seq(
      ("png", testImage(19, 11, 1, 3)), ("png", testImage(19, 11, 3, 5)),
      ("png", testImage(19, 11, 4, 9)), ("bmp", testImage(19, 11, 3, 7)))
    for ((fmt, img) <- cases) {
      val bytes = if (fmt == "bmp") ImageCodec.encodeBmp(img) else ImageCodec.encodePng(img)
      val gold = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(gold != null, s"ImageIO rejected our $fmt (ch=${img.channels})")
      assert(gold.getWidth == img.width && gold.getHeight == img.height)
      if (img.channels == 1) {
        // gray: compare raw raster samples — getRGB would run the
        // linear-gray → sRGB colorspace conversion, which is not identity
        assert(gold.getRaster.getNumBands == 1, s"gray PNG read with >1 band")
        for (y <- 0 until img.height; x <- 0 until img.width)
          assert(gold.getRaster.getSample(x, y, 0) ==
            (img.pixels(y * img.width + x) & 0xff), s"gray pixel ($x,$y) drifted")
      } else
        for (y <- 0 until img.height; x <- 0 until img.width)
          assert(gold.getRGB(x, y) == argbAt(img, x, y),
            s"$fmt ch=${img.channels} pixel ($x,$y) drifted")
    }
  }

  test("our decoder is golden-exact on ImageIO-WRITTEN PNG and BMP") {
    // the reverse direction: a third-party writer picks its own filters /
    // compression levels; our decoder must handle whatever it emits
    val w = 23; val h = 13
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val argb = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 7) % 256
      rgb.setRGB(x, y, (v << 16) | (((v + 85) % 256) << 8) | ((v + 170) % 256))
      argb.setRGB(x, y, (((v + 40) % 256) << 24) | (v << 16) | (v << 8) | v)
    }
    def bytesOf(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no ImageIO $fmt writer")
      bos.toByteArray
    }
    for ((buf, fmt, ch) <- Seq((rgb, "png", 3), (argb, "png", 4), (rgb, "bmp", 3))) {
      val decoded = ImageCodec.decode(bytesOf(buf, fmt))
        .fold(e => fail(s"ImageIO-written $fmt: $e"), identity)
      assert((decoded.width, decoded.height) == ((w, h)), s"$fmt dims")
      for (y <- 0 until h; x <- 0 until w) {
        val want = buf.getRGB(x, y)
        val p = (y * w + x) * decoded.channels
        def u(i: Int) = decoded.pixels(p + i) & 0xff
        val got =
          if (decoded.channels == 4) (u(3) << 24) | (u(0) << 16) | (u(1) << 8) | u(2)
          else 0xff000000 | (u(0) << 16) | (u(1) << 8) | u(2)
        assert(got == want, s"ImageIO-written $fmt pixel ($x,$y)")
      }
    }
  }

  test("pixel decode rejects out-of-scope or corrupt containers loudly") {
    assert(ImageCodec.decode("not an image".getBytes).isLeft)
    val png = ImageCodec.encodePng(testImage(8, 8, 3, 1))
    assert(ImageCodec.decodePng(png.take(40)).isLeft) // truncated chunk
    val interlaced = png.clone; interlaced(8 + 4 + 4 + 12) = 1 // IHDR interlace byte
    assert(ImageCodec.decodePng(interlaced).isLeft)
    val bmp = ImageCodec.encodeBmp(testImage(8, 8, 3, 2))
    val rle = bmp.clone
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(30, 1) // BI_RLE8
    assert(ImageCodec.decodeBmp(rle).isLeft)
    assert(ImageCodec.decodeBmp(bmp.take(53)).isLeft) // truncated
  }

  test("per-channel stats partition the decoded raster exactly") {
    val stats = MultimodalOps.qMmImageStats(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totals = MultimodalOps.qMmPixelDecode(spark, SfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(stats.nonEmpty)
    stats.groupBy(_._1).foreach { case (id, rows) =>
      val (channels, nBytes, pixelSum) = totals(id)
      assert(rows.length == channels, s"doc $id: ${rows.length} channel rows for $channels channels")
      assert(rows.map(_._3).sum == nBytes, s"doc $id: channel sample counts don't cover the raster")
      assert(rows.map(_._4).sum == pixelSum, s"doc $id: channel sums don't add up to the pixel sum")
    }
  }

  test("decoder is total: arbitrary or truncated bytes yield Left, never throw") {
    val rnd = new scala.util.Random(42) // deterministic fuzz corpus
    val pngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(160))(rnd.nextInt().toByte)
      ImageCodec.decode(junk)                         // unrecognized or garbage
      ImageCodec.decodePng(pngSig ++ junk)            // signature + garbage chunks
      ImageCodec.decodeBmp("BM".getBytes ++ junk)     // magic + garbage header
    }
    // every truncation prefix of VALID containers must be a clean Left
    val png = ImageCodec.encodePng(testImage(9, 7, 4, 11))
    val bmp = ImageCodec.encodeBmp(testImage(9, 7, 3, 13))
    for (k <- 0 until png.length) assert(ImageCodec.decodePng(png.take(k)).isLeft)
    for (k <- 0 until bmp.length) assert(ImageCodec.decodeBmp(bmp.take(k)).isLeft)
  }

  test("average-hash is container-invariant and matches raster arithmetic") {
    // the hash must depend only on the RASTER: PNG and BMP encodes of
    // the same pixels hash identically after their (very different)
    // decode paths
    for (seed <- Seq(3, 17, 42)) {
      val img = testImage(24, 13, 3, seed)
      val viaPng = MultimodalOps.averageHash(
        ImageCodec.decodePng(ImageCodec.encodePng(img)).toOption.get)
      val viaBmp = MultimodalOps.averageHash(
        ImageCodec.decodeBmp(ImageCodec.encodeBmp(img)).toOption.get)
      assert(viaPng == viaBmp, s"seed $seed: container changed the hash")
    }
    // and the registered query's bits match a driver-side recomputation
    val rows = MultimodalOps.qMmPhash(spark, SfDir).limit(50).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val (_, img, _) = MultimodalOps.syntheticImage(id)
      assert((r.getLong(1), r.getLong(2)) == MultimodalOps.averageHash(img),
        s"doc $id hash drifted from the source raster")
    }
    // flat images (all-equal pixels) must hash to all-zero bits, not noise
    val flat = ImageCodec.Image(16, 16, 1, Array.fill(256)(7.toByte))
    assert(MultimodalOps.averageHash(flat) == ((0L, 0L)))
  }

  test("phash near-dup pairing recalls every planted perturbed variant") {
    val pairs = MultimodalOps.qMmPhashNeardup(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    val plantedSources = (0L until nDocs by 8L).toSet
    // every planted variant must pair with its own source at tiny distance
    plantedSources.foreach { id =>
      val hit = pairs.find { case (a, b, _) => a == id && b == id + 10000000L }
      assert(hit.isDefined, s"planted variant of doc $id not recalled")
      assert(hit.get._3 <= 1, s"planted variant of doc $id at hamming ${hit.get._3}")
    }
    // verify symmetric sanity: all reported distances within the cut
    assert(pairs.forall(_._3 <= 3))
  }

  test("mm_pixel_decode sums match a driver-side arithmetic recomputation") {
    val rows = MultimodalOps.qMmPixelDecode(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, fmt, w, h, ch, n, sum) =>
      assert(fmt == (if (id % 4 == 3) "bmp" else "png"))
      assert(w == 16 + id % 16 && h == 8 + id % 8)
      assert(ch == (if (id % 4 == 0) 1L else if (id % 4 == 2) 4L else 3L))
      assert(n == w * h * ch)
      val want = (0L until n).map(k => (id * 31 + k) % 256).sum
      assert(sum == want, s"doc $id pixel_sum $sum != $want")
    }
  }

  // ---- JPEG entropy decode (JpegCodec) ----

  import graft.multimodal.JpegCodec

  /** ImageIO JPEG bytes at an explicit quality. */
  private def jpegBytes(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("JPEG decode tracks javax.imageio's libjpeg within a small tolerance") {
    // smooth gradients keep the comparison about the decoder (huffman /
    // IDCT / fancy-upsampling / color-convert agreement), not about
    // quantization loss; sizes cover non-multiple-of-8 and -16 edges
    // where block padding and chroma-edge replication bite
    val sizes = Seq((16, 16), (23, 13), (33, 17), (8, 8), (64, 48), (1, 1), (5, 3))
    var worst = 0
    for ((w, h) <- sizes; quality <- Seq(0.7f, 0.95f); gray <- Seq(true, false)) {
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = 40 + (x * 160) / math.max(w - 1, 1)
        val g = 30 + (y * 180) / math.max(h - 1, 1)
        val b = 60 + ((x + y) * 120) / math.max(w + h - 2, 1)
        if (gray) img.getRaster.setSample(x, y, 0, r)
        else img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bytes = jpegBytes(img, quality)
      val gold = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val mine = JpegCodec.decode(bytes)
        .fold(e => fail(s"$w x $h gray=$gray q=$quality: $e"), identity)
      assert((mine.width, mine.height) == ((w, h)))
      assert(mine.channels == (if (gray) 1 else 3))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until mine.channels) {
        val want =
          if (gray) gold.getRaster.getSample(x, y, 0)
          else (gold.getRGB(x, y) >> (16 - 8 * c)) & 0xff
        val got = mine.pixels((y * w + x) * mine.channels + c) & 0xff
        val d = math.abs(want - got)
        worst = math.max(worst, d)
        assert(d <= 3,
          s"$w x $h gray=$gray q=$quality ($x,$y) band $c: ours $got vs ImageIO $want")
      }
    }
    info(s"worst per-sample deviation vs ImageIO: $worst")
  }

  test("flat quant-1 tiles survive JPEG bit-exactly (the oracle's DC-only path)") {
    // 16x16 flat gray tiles align with both luma blocks and 4:2:0 chroma
    // blocks; at quality 1.0 the quant tables are all ones, so DC-only
    // blocks round-trip exactly through ANY conformant codec — this is
    // precisely the property qMmJpegDecode's DuckDB oracle relies on
    for ((tw, th) <- Seq((2, 1), (3, 2), (1, 1)); gray <- Seq(true, false)) {
      val w = tw * 16; val h = th * 16
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      def tileVal(tx: Int, ty: Int) = (37 + (ty * tw + tx) * 41) % 256
      for (y <- 0 until h; x <- 0 until w) {
        val v = tileVal(x / 16, y / 16)
        if (gray) img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (v << 8) | v) // R=G=B: exact YCbCr
      }
      val mine = JpegCodec.decode(jpegBytes(img, 1.0f))
        .fold(e => fail(s"${w}x$h gray=$gray: $e"), identity)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until mine.channels) {
        val got = mine.pixels((y * w + x) * mine.channels + c) & 0xff
        assert(got == tileVal(x / 16, y / 16),
          s"flat tile ${w}x$h gray=$gray ($x,$y) band $c not bit-exact")
      }
    }
  }

  test("JPEG restart markers: hand-built stream with DRI decodes exactly") {
    // a minimal single-component baseline JPEG built from the spec text:
    // quant table all ones, a 12-code DC table (categories 0-11 at length
    // 4), a single-code AC table (EOB = one "0" bit), restart interval 2.
    // Flat 8x8 tiles are DC-only, so the decode must be bit-exact — and
    // the writer is NOT ImageIO, so this also proves the Huffman path on
    // tables no Java encoder emits.
    val tiles = Seq(200, 50, 125, 8, 255, 0) // 48x8 image, 6 MCUs, RST after every 2
    val w = tiles.length * 8; val h = 8
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(2 + 1 + 64); b(0x00) // DQT: 8-bit table 0
    (0 until 64).foreach(_ => b(1))
    b(0xff); b(0xc0); u16(2 + 6 + 3) // SOF0: 1 component
    b(8); u16(h); u16(w); b(1); b(1); b(0x11); b(0)
    b(0xff); b(0xc4); u16(2 + 17 + 12); b(0x00) // DHT DC 0: 12 codes at len 4
    val dcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(b); (0 until 12).foreach(b)
    b(0xff); b(0xc4); u16(2 + 17 + 1); b(0x10) // DHT AC 0: one code "0" = EOB
    b(1); (0 until 15).foreach(_ => b(0)); b(0x00)
    b(0xff); b(0xdd); u16(4); u16(2) // DRI: restart every 2 MCUs
    b(0xff); b(0xda); u16(2 + 1 + 2 + 3) // SOS
    b(1); b(1); b(0x00); b(0); b(63); b(0)
    // entropy data: per MCU, DC category code (4 bits = the category
    // itself) + magnitude bits + EOB "0"; byte-align with 1s at restarts
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); nBits += 1
        if (nBits == 8) { b(bitBuf); if (bitBuf == 0xff) b(0x00); bitBuf = 0; nBits = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    var pred = 0; var rst = 0
    tiles.zipWithIndex.foreach { case (v, mcu) =>
      if (mcu > 0 && mcu % 2 == 0) {
        align(); b(0xff); b(0xd0 + rst); rst = (rst + 1) & 7
        pred = 0
      }
      val dc = 8 * (v - 128)
      val diff = dc - pred; pred = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      putBits(0, 1) // EOB
    }
    align(); b(0xff); b(0xd9) // EOI
    val img = JpegCodec.decode(out.toByteArray)
      .fold(e => fail(s"hand-built restart JPEG: $e"), identity)
    assert((img.width, img.height, img.channels) == ((w, h, 1)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xff) == tiles(x / 8),
        s"($x,$y): ${img.pixels(y * w + x) & 0xff} != ${tiles(x / 8)}")
    // a WRONG restart marker index must be rejected, not misparsed
    val broken = out.toByteArray.clone()
    val rstPos = broken.indices.dropRight(1).find(i => // first FF D0 pair
      (broken(i) & 0xff) == 0xff && (broken(i + 1) & 0xff) == 0xd0).get + 1
    broken(rstPos) = 0xd5.toByte
    assert(JpegCodec.decode(broken).isLeft)
  }

  test("JPEG single-component scan ignores declared 2x2 sampling (T.81 non-interleaved)") {
    // a grayscale JPEG may legally declare 2x2 sampling factors; per
    // T.81 A.2 a one-component scan is NON-interleaved — one data unit
    // per MCU — so the decoder must walk 1 block per MCU, not h x v.
    // Flat 8x8 tiles at quant 1 are DC-only, so decode is bit-exact.
    val tiles = Seq(90, 201)
    val w = tiles.length * 8; val h = 8
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(2 + 1 + 64); b(0x00) // DQT all ones
    (0 until 64).foreach(_ => b(1))
    b(0xff); b(0xc0); u16(2 + 6 + 3) // SOF0: 1 component, declared 2x2
    b(8); u16(h); u16(w); b(1); b(1); b(0x22); b(0)
    b(0xff); b(0xc4); u16(2 + 17 + 12); b(0x00) // DC table: 12 codes at len 4
    val counts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    counts.foreach(b); (0 until 12).foreach(b)
    b(0xff); b(0xc4); u16(2 + 17 + 1); b(0x10) // AC table: EOB = "0"
    b(1); (0 until 15).foreach(_ => b(0)); b(0x00)
    b(0xff); b(0xda); u16(2 + 1 + 2 + 3) // SOS
    b(1); b(1); b(0x00); b(0); b(63); b(0)
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); nBits += 1
        if (nBits == 8) { b(bitBuf); if (bitBuf == 0xff) b(0x00); bitBuf = 0; nBits = 0 }
        i -= 1
      }
    }
    var pred = 0
    tiles.foreach { v =>
      val dc = 8 * (v - 128)
      val diff = dc - pred; pred = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      putBits(0, 1) // EOB
    }
    if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    b(0xff); b(0xd9) // EOI
    val img = JpegCodec.decode(out.toByteArray)
      .fold(e => fail(s"grayscale-with-2x2-factors JPEG rejected: $e"), img => img)
    assert((img.width, img.height, img.channels) == ((w, h, 1)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xff) == tiles(x / 8),
        s"($x,$y): ${img.pixels(y * w + x) & 0xff} != ${tiles(x / 8)}")
  }

  test("JPEG 4:2:2: hand-built three-component stream decodes exactly") {
    // h2v1 subsampling (Y 2x1, Cb/Cr 1x1): each MCU interleaves two Y
    // blocks + one Cb + one Cr — the multi-component MCU walk and the
    // horizontal fancy-upsample path, which no ImageIO-written golden
    // exercises (Java's writer emits 4:2:0). Flat gray 16-px tiles align
    // with the 16-wide MCUs, chroma is flat 128, so decode is bit-exact.
    val tiles = Seq(30, 190, 100, 255) // 64x8, 4 MCUs of 16x8
    val w = tiles.length * 16; val h = 8
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8)
    b(0xff); b(0xdb); u16(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(_ => b(1))
    b(0xff); b(0xc0); u16(2 + 6 + 9) // SOF0: 3 components
    b(8); u16(h); u16(w); b(3)
    b(1); b(0x21); b(0) // Y: h=2, v=1
    b(2); b(0x11); b(0) // Cb: 1x1
    b(3); b(0x11); b(0) // Cr: 1x1
    b(0xff); b(0xc4); u16(2 + 17 + 12); b(0x00) // DC table: 12 codes at len 4
    val counts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    counts.foreach(b); (0 until 12).foreach(b)
    b(0xff); b(0xc4); u16(2 + 17 + 1); b(0x10) // AC table: EOB = "0"
    b(1); (0 until 15).foreach(_ => b(0)); b(0x00)
    b(0xff); b(0xda); u16(2 + 1 + 6 + 3)
    b(3); b(1); b(0x00); b(2); b(0x00); b(3); b(0x00); b(0); b(63); b(0)
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); nBits += 1
        if (nBits == 8) { b(bitBuf); if (bitBuf == 0xff) b(0x00); bitBuf = 0; nBits = 0 }
        i -= 1
      }
    }
    def emitDc(diff: Int): Unit = {
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      putBits(0, 1) // EOB
    }
    var predY = 0; val predC = Array(0, 0)
    tiles.foreach { v =>
      val dc = 8 * (v - 128)
      emitDc(dc - predY); predY = dc // first Y block of the MCU
      emitDc(0) // second Y block: same flat value, diff 0
      emitDc(0 - predC(0)); predC(0) = 0 // Cb flat 128 -> DC 0
      emitDc(0 - predC(1)); predC(1) = 0 // Cr
    }
    if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    b(0xff); b(0xd9)
    val img = JpegCodec.decode(out.toByteArray)
      .fold(e => fail(s"hand-built 4:2:2 JPEG: $e"), identity)
    assert((img.width, img.height, img.channels) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((img.pixels((y * w + x) * 3 + c) & 0xff) == tiles(x / 16),
        s"($x,$y) band $c: ${img.pixels((y * w + x) * 3 + c) & 0xff} != ${tiles(x / 16)}")
  }

  test("JPEG decoder rejects progressive loudly and is total under fuzzing") {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 128)
    val prog = jpegBytes(img, 0.8f, progressive = true)
    JpegCodec.decode(prog) match {
      case Left(reason) => assert(reason.contains("SOF2"), s"wrong reason: $reason")
      case Right(_) => fail("progressive JPEG must be rejected, not half-decoded")
    }
    val good = jpegBytes(img, 0.8f)
    assert(JpegCodec.decode(good).isRight)
    // totality: truncations at every prefix and deterministic byte flips
    // must yield Left or Right, never an escaped exception
    for (n <- 0 until good.length)
      JpegCodec.decode(java.util.Arrays.copyOf(good, n))
    for (k <- good.indices by 7) {
      val mutated = good.clone()
      mutated(k) = (mutated(k) ^ 0x5a).toByte
      JpegCodec.decode(mutated)
    }
    // via the container sniffer too
    assert(ImageCodec.decode(good).exists(_.width == 32))
  }

  test("phash clusters: pairs co-labeled, labels are component minima, sizes add up") {
    val pairs = MultimodalOps.qMmPhashNeardup(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = MultimodalOps.qMmPhashClusters(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val label = rows.map(r => r._1 -> r._2).toMap
    assert(pairs.nonEmpty, "no near-dup pairs — clustering untested")
    // every near-dup pair must land in one component
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters") }
    // label = min member id; is_rep marks exactly that member
    val members = rows.groupBy(_._2)
    members.foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c, s"cluster $c label is not its min member") }
    rows.foreach { case (id, c, _, rep) => assert(rep == (id == c)) }
    // sizes: every member agrees with its component's cardinality, and the
    // component sizes partition the image universe
    members.foreach { case (c, ms) =>
      assert(ms.forall(_._3 == ms.length), s"cluster $c size mismatch") }
    assert(rows.length == members.values.map(_.length).sum)
    // non-vacuous: transitive chains exist (some component bigger than a pair)
    assert(members.values.exists(_.length > 2),
      "no multi-image component — transitivity untested")
  }

  test("audio VAD: spans replay from the energy frame; silence-only case live") {
    val energy = MultimodalOps.qMmAudioEnergy(spark, SfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val got = MultimodalOps.qMmAudioVad(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == energy.size, "one VAD row per (doc, channel)")
    got.foreach { case (doc, ch, nWin, nAct, nSpans, longest) =>
      val wins = energy((doc, ch))
      assert(nWin == wins.length)
      val thr = wins.map(_._2).sum / wins.length
      val active = wins.map(_._2 > thr)
      assert(nAct == active.count(identity))
      // run-length encode the active mask
      val runs = active.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true)  => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(nSpans == runs.length, s"($doc,$ch): span count mismatch")
      assert(longest == (if (runs.isEmpty) 0 else runs.max), s"($doc,$ch): longest mismatch")
    }
    // both regimes carry traffic: segmented channels AND silence-only ones
    assert(got.exists(_._5 > 0), "no active spans anywhere — threshold vacuous")
    assert(got.exists(_._5 == 0), "no silence-only channel — zero path untested")
  }
}
