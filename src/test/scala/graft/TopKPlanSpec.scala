package graft

import org.apache.spark.sql.functions._
import graft.operators.WindowOps
import graft.plans.TopK

/** Whole-operator Catalyst extension (SURVEY.md §2.G): the custom
  * TopKPerGroup logical node must plan through TopKPerGroupExec and return
  * exactly the window-function result. */
class TopKPlanSpec extends SparkSpec {

  test("custom plan executes through TopKPerGroupExec") {
    val df = TopK.topKPerGroup(Tables.orders(spark, SfDir), 3,
      Seq(col("o_orderpriority")), Seq(col("o_totalprice").desc, col("o_orderkey")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    // exactly one shuffle: the ClusteredDistribution-mandated hash exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 1)
    assert(!plan.contains("Window"), "fell back to a window plan")
  }

  test("custom top-k equals the window-function top-k") {
    val custom = WindowOps.qTopKCustomPlan(spark, SfDir)
    val window = WindowOps.qWindowTopK(spark, SfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    assert(custom.count() == window.count())
    assert(custom.exceptAll(window).count() == 0)
    assert(window.exceptAll(custom).count() == 0)
  }

  test("k larger than any group returns every row") {
    val all = TopK.topKPerGroup(Tables.region(spark, SfDir), 1000,
      Seq(col("r_regionkey")), Seq(col("r_name")))
    assert(all.count() == Tables.region(spark, SfDir).count())
  }
}
