package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities (SURVEY.md §5): pre-shuffle fact tables by
  * their join key ONCE at write time so repeated fact⋈fact joins are
  * exchange-free.
  *
  * This is the 100 TB answer to `orders ⋈ lineitem`-class joins: a shuffle
  * of the big side per query is the dominant cost at scale, and bucketing
  * amortizes it into the layout. Bucket counts should be sized so one
  * bucket ⋈ bucket task fits in executor memory (e.g. 100 TB fact / 4096
  * buckets ≈ 25 GB per bucket pre-projection — with column pruning the
  * joined working set lands in the hundreds of MB).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Sorting within buckets
    * lets the join pick sort-merge without a per-query sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count —
    * planned with zero Exchange on either side (asserted in BucketingSpec). */
  def cocolocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write a fact table hive-partitioned by a (low-cardinality) derived
    * column — the lake layout that turns time/tenant filters into
    * directory pruning: a reader filtering on the partition column scans
    * only matching directories (PartitionFilters in the plan, asserted in
    * BucketingSpec). At 100 TB this is the first 100-1000x reduction
    * before any row is read. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
