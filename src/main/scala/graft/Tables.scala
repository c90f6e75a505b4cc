package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single place that knows how to load the star-schema parquet tables.
  *
  * All loads are plain `spark.read.parquet` so Catalyst gets full
  * pushdown/pruning; callers project and filter declaratively and the
  * parquet scan only materializes what survives (`PushedFilters` /
  * `ReadSchema` in explain output).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; read nanos as long and convert to
    * microsecond TIMESTAMP_NTZ (integer division — double math would lose
    * precision at 1e18 nanos). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** Round-robin repartition to the session's default parallelism.
    *
    * For CPU-heavy per-row pipelines (shingling, regex scans) over a
    * SMALL file count, the scan yields too few partitions and the map
    * runs on one core while 31 idle — one tiny shuffle of the raw rows
    * buys full map parallelism. At production scale the scan's natural
    * partitioning (maxPartitionBytes over many files) already provides
    * this and the repartition collapses to a cheap rebalance; never use
    * it to move LARGE data that is already well-partitioned. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
