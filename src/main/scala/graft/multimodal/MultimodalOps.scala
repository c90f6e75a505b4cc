package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.E): media as opaque binary
  * columns with typed metadata, decoded/feature-extracted in
  * partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but everything Spark-side is real:
  * binary column handling, schema, per-partition batching, and the
  * mapPartitions seam where a vectorized decoder (or Pandas UDF in the
  * Python API) would plug in.
  */
object MultimodalOps {

  /** Byte payloads synthesized from document text (UTF-8) so stats have a
    * DuckDB oracle; in production this column comes straight from parquet. */
  private def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))

  /** Opaque-binary stats: size, content hash, metadata passthrough — the
    * cheap scan-side pass that runs before any expensive decode. */
  def qMmBinaryStats(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"))
      .orderBy("doc_id")

  /** One decoded media record. Width/height/frames come from the STUB. */
  case class DecodedMedia(doc_id: Long, n_bytes: Long, batch_size: Int,
      width: Int, height: Int, n_frames: Int)

  /** Decode kernel. REAL for PNG and JPEG containers — width/height parsed
    * straight from the header bytes (IHDR / SOF marker), no codec library —
    * and a clearly-marked deterministic STUB for everything else (this
    * container ships no pixel decoders; a deployment swaps only the
    * fallback for a JNI/ffmpeg call, the batching contract stays). */
  private[graft] def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def u32(i: Int) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    if (bytes.length >= 24 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
      // PNG: IHDR is always the first chunk; width/height at offsets 16/20
      (u32(16), u32(20), 1)
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      var out: Option[(Int, Int, Int)] = None
      while (out.isEmpty && i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return fallbackStub(bytes) // corrupt stream
        val marker = bytes(i + 1) & 0xff
        val len = u16(i + 2)
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          out = Some((u16(i + 7), u16(i + 5), 1)) // SOF: height then width
        else i += 2 + len
      }
      out.getOrElse(fallbackStub(bytes))
    } else fallbackStub(bytes)
  }

  /** STUB for non-image payloads: deterministic pseudo-dimensions. */
  private def fallbackStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (b0 % 64 + 1, b1 % 64 + 1, bytes.length % 16 + 1)
  }

  /** Partition-batched decode: rows are grouped into fixed-size batches
    * inside each partition (the shape a vectorized decoder wants), decoded,
    * and re-flattened. mapPartitions is the deliberate seam — this is
    * per-partition imperative logic no built-in operator expresses. */
  def decodeInBatches(df: DataFrame, batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.map { case (id, bytes) =>
            val (w, h, f) = decodeHeader(bytes)
            DecodedMedia(id, bytes.length.toLong, batch.size, w, h, f)
          }
        }
      }
      .toDF()
  }

  /** Driver-contract query: decode the corpus in batches of 32. The
    * batch_size column is dropped from the output (it depends on partition
    * boundaries); determinism of the rest is asserted in MultimodalSpec. */
  def qMmDecodeStub(spark: SparkSession, dir: String): DataFrame =
    decodeInBatches(payloads(spark, dir), 32)
      .select("doc_id", "n_bytes", "width", "height", "n_frames")
      .orderBy("doc_id")

  /** One resized media record; target box + STUB-computed output dims. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int)

  /** Aspect-preserving resize planning: real fit-into-box arithmetic on
    * the decoded dimensions; the pixel resample itself is the same stub
    * seam as decode (a deployment swaps the kernel, the plan/metadata
    * path — which is what Spark owns — stays). */
  def resizeToBox(decoded: DataFrame, boxW: Int, boxH: Int): DataFrame = {
    val scale = least(lit(boxW.toDouble) / col("width"), lit(boxH.toDouble) / col("height"), lit(1.0))
    decoded.select(
      col("doc_id"), col("width"), col("height"),
      greatest(floor(col("width") * scale), lit(1)).cast("int").as("out_width"),
      greatest(floor(col("height") * scale), lit(1)).cast("int").as("out_height"))
  }

  /** Driver-contract query: decoded dims fit into a 32x32 box. */
  def qMmResizeStub(spark: SparkSession, dir: String): DataFrame =
    resizeToBox(
      decodeInBatches(payloads(spark, dir), 32)
        .select("doc_id", "width", "height"), 32, 32)
      .orderBy("doc_id")

  /** Frame sampling: treat the payload as a stream of fixed-size "frames"
    * and keep every `stride`-th one — the video-pipeline subsample step.
    * Pure column algebra over the binary: frame i = bytes
    * [i*frameBytes, (i+1)*frameBytes); emitted as (doc_id, frame_idx,
    * frame_md5) so downstream dedup/feature steps key on content. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("doc_id"), col("payload"),
      posexplode_outer(expr(
        s"transform(sequence(0, greatest(cast(octet_length(payload) / $frameBytes as int) - 1, 0), $stride)," +
          s" i -> md5(substring(payload, i * $frameBytes + 1, $frameBytes)))"))
        .as(Seq("sample_idx", "frame_md5")))
      .select(col("doc_id"), col("sample_idx").cast("long").as("sample_idx"), col("frame_md5"))

  /** Driver-contract query: every 4th 32-byte frame of each payload. */
  def qMmFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(payloads(spark, dir), 32, 4)
      .orderBy("doc_id", "sample_idx")
}
