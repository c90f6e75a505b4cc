package graft

import org.apache.spark.sql.functions._
import graft.operators.AssocOps

/** Association-mining contracts (SURVEY.md §2.B q_market_basket) beyond
  * the DuckDB oracle. */
class AssocSpec extends SparkSpec {

  test("market basket: result invariants and hand-recomputed lift on the top pair") {
    val rows = AssocOps.qMarketBasket(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty, "no qualifying pairs at spec SF — support threshold too high")
    rows.foreach { case (a, b, nab, na, nb, _) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(nab >= 3, s"pair ($a,$b) below support")
      assert(nab <= math.min(na, nb), s"pair ($a,$b): support exceeds a part's own count")
    }
    // descending lift with the deterministic tiebreak
    val keys = rows.map { case (a, b, _, _, _, l) => (-l, a, b) }
    assert(keys.sameElements(keys.sorted), "rows not ordered by (lift desc, part_a, part_b)")
    // recompute the top pair's statistics straight from the raw tables
    val (a, b, nab, na, nb, lift) = rows.head
    val lines = Tables.lineitem(spark, SfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val wantNab = byOrder.count { case (_, parts) => parts(a) && parts(b) }
    val partCnt = lines.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = Tables.orders(spark, SfDir).count()
    assert(nab == wantNab, s"top pair co-order count $nab vs recomputed $wantNab")
    assert(na == partCnt(a) && nb == partCnt(b), "per-part counts drifted")
    assert(lift == nab * nOrders * 1000000L / (na * nb), "lift arithmetic drifted")
    assert(lift > 1000000L, "top pair not positively associated — ranking broken")
  }

  test("market basket plan: in-plan pair expansion, no fact self-join, top-20 as TakeOrdered") {
    val plan = AssocOps.qMarketBasket(spark, SfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian leaked into the plan:\n${plan.linesIterator.take(40).mkString("\n")}")
    // the ONE nested-loop join is the sanctioned broadcast-scalar cross
    // (n_orders, 1 row)
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 1 && bnlj.forall(_.contains("Cross")),
      s"unexpected nested-loop join:\n${bnlj.mkString("\n")}")
    // pairs come from exploding the basket arrays, not from re-joining
    // the fact table against itself (that formulation scans lineitem 3x)
    assert(plan.contains("Generate explode"),
      s"pair generation lost the basket explode:\n${plan.linesIterator.take(40).mkString("\n")}")
    assert(!plan.contains("Join [l_orderkey"),
      s"fact-table self-join reappeared:\n${plan.linesIterator.take(40).mkString("\n")}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-20 is a full sort:\n${plan.linesIterator.take(40).mkString("\n")}")
  }
}
