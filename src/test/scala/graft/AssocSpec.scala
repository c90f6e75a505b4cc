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
    // assert on plan NODE CLASSES, not rendered-string substrings (ADVICE
    // r10 #3): the string form changes across Spark versions; the exec
    // node types are the actual contract being pinned
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val root: SparkPlan = AssocOps.qMarketBasket(spark, SfDir).queryExecution.executedPlan
    // collect() does not descend through AQE wrappers (their inner plan is
    // not a `children` entry), so walk those explicitly
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(root)
    assert(nodes.collect { case c: CartesianProductExec => c }.isEmpty,
      "cartesian leaked into the plan")
    // the ONE nested-loop join is the sanctioned broadcast-scalar cross
    // (n_orders, 1 row)
    val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size <= 1 &&
        bnlj.forall(_.joinType == org.apache.spark.sql.catalyst.plans.Cross),
      s"unexpected nested-loop join: ${bnlj.map(_.joinType).mkString(",")}")
    // pairs come from exploding the basket arrays, not from re-joining
    // the fact table against itself (that formulation scans lineitem 3x)
    val gens = nodes.collect { case g: GenerateExec => g }
    assert(gens.exists(_.boundGenerator.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.ExplodeBase]),
      "pair generation lost the basket explode")
    val equiJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
    }
    assert(!equiJoins.exists(_.exists(_.references.exists(_.name == "l_orderkey"))),
      "fact-table self-join on l_orderkey reappeared")
    assert(nodes.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "global top-20 is a full sort")
  }
}
