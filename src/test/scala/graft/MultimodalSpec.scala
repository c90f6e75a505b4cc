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

  test("binary stats match the payload bytes") {
    val row = MultimodalOps.qMmBinaryStats(spark, SfDir).head()
    val text = Tables.documents(spark, SfDir)
      .filter(col("doc_id") === row.getLong(0)).select("text").head().getString(0)
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
  }
}
