package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located joins must plan without a shuffle on either side —
  * the layout-level optimization fact⋈fact joins rely on at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("partitioned layout prunes directories on partition-column filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/orders"
    Bucketing.writePartitioned(
      Tables.orders(spark, SfDir)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM")),
      dir, "order_month")
    val pruned = spark.read.parquet(dir).filter(col("order_month") === "1997-03")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("order_month"),
      s"no partition pruning:\n$plan")
    // and the pruned read returns exactly the month's rows
    val expected = Tables.orders(spark, SfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-03").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("join of two tables bucketed on the key has no Exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey", "o_totalprice")
          .withColumnRenamed("o_orderkey", "k"),
        "b_orders", "k", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, SfDir).select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "k"),
        "b_lineitem", "k", 8)
      val joined = Bucketing.cocolocatedJoin(spark, "b_orders", "b_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same result as the plain join
      val expected = Tables.orders(spark, SfDir)
        .join(Tables.lineitem(spark, SfDir),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
