package graft

import org.apache.spark.sql.functions._

import graft.operators.GovernanceOps

/** Right-to-be-forgotten propagation: the audit must prove the key is
  * gone from every derived frame AND price the survivor rows whose
  * derived values the erasure changed (the part a naive row-delete on
  * derived tables silently skips). */
class GovernanceSpec extends SparkSpec {

  test("forget audit: residuals zero, purge counts exact, pack shift priced") {
    val audit = GovernanceOps.qGdprForgetKeys(spark, SfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(audit.keySet == Set("documents", "dedup_decision", "pack_sequences"))
    val docs = Tables.documents(spark, SfDir)
    val n = docs.count()
    val forgotten = docs.filter(col("doc_id") % 97 === 13)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    audit.values.foreach { case (_, _, _, residual, _) =>
      assert(residual == 0L, "a forgotten key survived in a derived frame")
    }
    val (db, da, dp, _, dc) = audit("documents")
    assert(db == n && dp == forgotten.length && da == n - forgotten.length && dc == 0)
    // decision frame: each forgotten doc also takes its planted copy with it
    val plantedForgotten = forgotten.count(_ % 10 == 0)
    val (eb, ea, ep, _, _) = audit("dedup_decision")
    assert(eb == n + docs.filter(col("doc_id") % 10 === 0).count())
    assert(ep == forgotten.length + plantedForgotten && ea == eb - ep)
    // packing is a prefix sum: EVERY survivor after the first erased doc
    // moves — the audit must price exactly that set
    val (pb, pa, pp, _, pc) = audit("pack_sequences")
    assert(pb == n && pp == forgotten.length && pa == n - forgotten.length)
    val shifted = docs.filter(col("doc_id") > forgotten.head)
      .filter(col("doc_id") % 97 =!= 13).count()
    assert(pc == shifted,
      s"pack n_changed $pc != survivors after first erased doc $shifted")
  }

  test("k-anonymity: group arithmetic exact, violations genuinely present, actions consistent") {
    val rows = GovernanceOps.qKAnonymity(spark, SfDir).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getBoolean(4), r.getString(5))))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length,
      "one row per quasi-identifier group")
    rows.foreach { case (qi, (n, violates, action)) =>
      assert(n >= 1)
      assert(violates == (n < 5), s"$qi: flag vs count")
      assert(action == (if (violates) "suppress" else "release"), s"$qi: action")
    }
    // group sizes conserve the population
    val n = Tables.customer(spark, SfDir).count()
    assert(rows.map(_._2._1).sum == n, "group sizes do not sum to the population")
    // the audit is not vacuous: violations always exist at test scales,
    // and once the population can fill groups past k (sf0.01+: 15k
    // customers over ~600 QI cells) BOTH outcome classes must appear
    assert(rows.exists(_._2._2), "no k-violations — the audit has nothing to flag")
    if (n >= 1000)
      assert(rows.exists(!_._2._2),
        "quasi-identifier fragmentation suppressed the whole population")
  }

  test("batched erasure requests ≡ sequential application") {
    // the production shape: a keyed request TABLE; a compliance queue
    // drains N requests with ONE rebuild, so the kernel must make
    // batch(R1 ∪ R2) indistinguishable from apply(R1) then apply(R2)
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val pairs = graft.dedup.DedupOps.cachedJaccardPairs(spark, SfDir)
    val r1 = docs.filter(col("doc_id") % 97 === 13).select("doc_id")
    val r2 = docs.filter(col("doc_id") % 101 === 7).select("doc_id")
    assert(r1.count() > 0 && r2.count() > 0, "vacuous request sets")

    val (batchSurv, batchPairs) =
      GovernanceOps.applyErasure(docs, pairs, r1.unionByName(r2))
    val (s1, p1) = GovernanceOps.applyErasure(docs, pairs, r1)
    val (seqSurv, seqPairs) = GovernanceOps.applyErasure(s1, p1, r2)

    def frameEq(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: batched and sequential application diverge")
    }
    frameEq(batchSurv, seqSurv, "survivors")
    frameEq(batchPairs, seqPairs, "surviving pairs")
    // and the derived frame REBUILT from each agrees — the thing the
    // audit actually ships
    frameEq(graft.dedup.DedupOps.decisionFrame(batchSurv, batchPairs),
      graft.dedup.DedupOps.decisionFrame(seqSurv, seqPairs),
      "rebuilt decision frame")
    // batching genuinely erased both sets (|r1 ∪ r2|, not |r1|+|r2| —
    // the sets intersect for any corpus reaching doc_id ≡ 5057 mod 9797)
    assert(batchSurv.count() ==
      docs.count() - r1.unionByName(r2).distinct().count())
  }

  test("erasure request membership executes as a broadcast join, not a shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val pairs = graft.dedup.DedupOps.cachedJaccardPairs(spark, SfDir)
    val req = docs.filter(col("doc_id") % 97 === 13).select("doc_id")
    // the broadcast() hint in applyErasure forces BroadcastHashJoinExec
    // at static planning, so the initial physical plan is sufficient
    // evidence — no execution needed (AQE could only KEEP a broadcast
    // join it already has; it never demotes a hinted one)
    val (surv, _) = GovernanceOps.applyErasure(docs, pairs, req)
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val joins = walk(surv.queryExecution.executedPlan)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty,
      "request-key anti-join did not execute as a broadcast hash join")
  }

  test("decision rebuild re-elects a representative when the rep is erased") {
    import spark.implicits._
    // doc 1 is the cluster rep of the (1, 2) near-dup pair; erasing it
    // must flip 2 from near_dup to keep in the rebuilt frame — the
    // cluster-semantics reason erasure is a rebuild, not a row filter
    val base = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val before = graft.dedup.DedupOps.decisionFrame(base, pairs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before(2L) == "near_dup")
    val after = graft.dedup.DedupOps.decisionFrame(
      base.filter(col("doc_id") =!= 1L),
      pairs.filter(col("doc_a") =!= 1L && col("doc_b") =!= 1L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after == Map(2L -> "keep"))
  }

  test("access report: absent keys answered explicitly, dup status and pack position exact") {
    val report = GovernanceOps.qGdprAccessReport(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    // the two planted never-held keys must be PRESENT rows, not silence
    val absent = report.filter(r => r._1 == 9999991L || r._1 == 9999997L)
    assert(absent.length == 2)
    absent.foreach { case (_, held, nChunks, q, d, ts) =>
      assert(held == 0L && nChunks == 0L && q == "not_held" &&
        d == "not_held" && ts == -1L)
    }
    // every held row's inventory matches an independent recomputation
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val packStarts = graft.text.TextOps
      .qPackSequences(spark, SfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val repOf = docs.groupBy(_._2).values
      .flatMap { g => val rep = g.map(_._1).min; g.map(t => t._1 -> rep) }.toMap
    report.filter(_._2 == 1L).foreach { case (id, _, nChunks, q, d, ts) =>
      val n = docs(id).trim.split("\\s+").length.toLong
      val expectChunks = 1L + math.ceil(math.max(n - 32L, 0L) / 24.0).toLong
      assert(nChunks == expectChunks, s"doc $id chunks $nChunks != $expectChunks")
      assert(d == (if (repOf(id) == id) "rep" else "exact_dup"))
      assert(ts == packStarts(id), s"doc $id token_start $ts != ${packStarts(id)}")
      assert(q == "keep" || q == "drop")
    }
    assert(report.count(_._2 == 1L) == docs.keySet.count(_ % 97 == 29))
  }
}
