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

  test("resize fits every decoded frame inside the box, preserving aspect") {
    import org.apache.spark.sql.Row
    MultimodalOps.qMmResizeStub(spark, SfDir).collect().foreach {
      case Row(_, w: Int, h: Int, ow: Int, oh: Int) =>
        assert(ow <= 32 && oh <= 32 && ow >= 1 && oh >= 1)
        // aspect preserved within floor rounding
        if (w >= h) assert(ow >= oh) else assert(oh >= ow)
    }
  }

  test("frame sampling keeps every stride-th frame with content hashes") {
    val out = MultimodalOps.qMmFrameSample(spark, SfDir)
    val one = out.filter(col("doc_id") === 1).collect()
    val payload = Tables.documents(spark, SfDir)
      .filter(col("doc_id") === 1).select("text").head().getString(0).getBytes("UTF-8")
    val expectedFrames = (math.max(payload.length / 32 - 1, 0) / 4) + 1
    assert(one.length == expectedFrames, s"got ${one.length}, want $expectedFrames")
    // deterministic across runs
    assert(out.collect().toSeq == MultimodalOps.qMmFrameSample(spark, SfDir).collect().toSeq)
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
}
