package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance lifecycle operators — the pieces a production lake
  * needs around the analytics themselves. First resident:
  * right-to-be-forgotten delete propagation (the reference's DELETE
  * story is Postgres-native row deletes behind the UNIQUE(id) key,
  * import_cards.py's replace-on-conflict path; a lakehouse pipeline
  * must instead propagate the erasure through every DERIVED table,
  * because derived rows are functions of the deleted rows, not copies
  * of them).
  */
object GovernanceOps {

  /** The deterministic forget set: every doc whose id ≡ 13 (mod 97) —
    * pure id arithmetic so the DuckDB oracle reproduces it exactly
    * (the planted-twin convention). A real deployment feeds a keyed
    * erasure-request table here; everything downstream is unchanged. */
  private val ForgetMod = 97L
  private val ForgetRem = 13L
  private def isForgotten(id: org.apache.spark.sql.Column) =
    pmod(id, lit(ForgetMod)) === ForgetRem

  /** GDPR / right-to-be-forgotten delete propagation across the fact
    * table and its derived frames, with a per-frame audit row — one
    * entry proving the key is GONE everywhere and pricing what that
    * costs:
    *
    *   - `documents` (base): plain keyed anti-filter.
    *   - `dedup_decision`: decisions are NOT row-local — erasing a doc
    *     erases its planted exact copy, can re-elect a cluster
    *     representative, and can split a component the erased doc
    *     bridged — so the frame is REBUILT over the surviving corpus.
    *     The expensive pair mine is NOT re-run: Jaccard is pairwise, so
    *     the survivors' pair list is exactly the session-cached full
    *     list minus edges touching a forgotten key (edge filter, no
    *     corpus re-shingle).
    *   - `pack_sequences`: token starts are a global prefix sum, so
    *     every survivor after the first erased doc moves — re-packed
    *     over the surviving corpus via the distributed prefix-sum
    *     kernel.
    *
    * Audit columns per frame: rows_before / rows_after (both from real
    * frame computations), purged (their difference), residual_refs
    * (post-erasure rows still referencing a forgotten key — the
    * compliance boolean, must be 0; planted copies map back through the
    * +1e6 id band), and n_changed (SURVIVING rows whose derived values
    * changed — the propagation cost a naive row-delete would silently
    * skip). Everything is integer-exact; the oracle replays both frame
    * generations in SQL. Scale shape: the base scans, one decision
    * rebuild, and one re-pack — all the linear pipelines this suite
    * already prices — plus metadata-sized audit aggregates. */
  def qGdprForgetKeys(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val erased = docs.filter(!isForgotten(col("doc_id")))

    // base-table audit: rows_after and residual_refs are aggregated from
    // the ACTUAL erased frame, exactly as frameAudit does for the derived
    // frames — deriving rows_after as before−purged from the PRE-erasure
    // scan (the r11 form) could never witness a bug in the erased filter
    // itself, the thing this row's audit exists to check (ADVICE r11)
    val baseAudit = docs.agg(count(lit(1)).as("rows_before"))
      .crossJoin(broadcast(erased.agg(
        count(lit(1)).as("rows_after"),
        coalesce(sum(when(isForgotten(col("doc_id")), 1L).otherwise(0L)), lit(0L))
          .as("residual_refs"))))
      .select(lit("documents").as("frame"),
        col("rows_before"),
        col("rows_after"),
        (col("rows_before") - col("rows_after")).as("purged"),
        col("residual_refs"),
        lit(0L).as("n_changed"))

    // dedup-decision audit: rebuild over survivors; pair evidence is the
    // cached full mine minus edges touching a forgotten key (Jaccard is
    // pairwise — survivor-survivor similarity is unaffected by deletes)
    val pairsAll = graft.dedup.DedupOps.cachedJaccardPairs(spark, dir)
    val pairsErased = pairsAll
      .filter(!isForgotten(col("doc_a")) && !isForgotten(col("doc_b")))
    // BEFORE = the session-cached materialized artifact (a pipeline holds
    // its decision table; erasure does not re-derive it) — only the AFTER
    // rebuild is this entry's own priced propagation work
    val decBefore = graft.dedup.DedupOps.cachedDecisionFrame(spark, dir)
    val decAfter = graft.dedup.DedupOps.decisionFrame(erased, pairsErased)
    // planted copies live at doc_id + 1e6; map back before the key test
    def srcId(id: org.apache.spark.sql.Column) =
      when(id >= 1000000L, id - 1000000L).otherwise(id)
    val decAudit = frameAudit("dedup_decision", decBefore, decAfter,
      residual = isForgotten(srcId(col("doc_id"))),
      changed = (b, a) =>
        b("decision") =!= a("decision") || b("cluster") =!= a("cluster"))

    // pack-sequences audit: re-pack the survivors (global prefix sum)
    val packBefore = graft.text.TextOps.packSequences(
      spark, Tables.spread(spark, docs))
    val packAfter = graft.text.TextOps.packSequences(
      spark, Tables.spread(spark, erased))
    val packAudit = frameAudit("pack_sequences", packBefore, packAfter,
      residual = isForgotten(col("doc_id")),
      changed = (b, a) =>
        b("token_start") =!= a("token_start") || b("seq_first") =!= a("seq_first"))

    baseAudit.unionByName(decAudit).unionByName(packAudit).orderBy("frame")
  }

  /** k-anonymity audit over a quasi-identifier set — the re-identification
    * check a training-data governance pass runs before release (PII
    * scrubbing removes DIRECT identifiers, `text_pii_scrub`; this guards
    * the INDIRECT ones): group the population by the quasi-identifiers
    * (nation, market segment, account-balance band) and flag every group
    * smaller than k=5 — each of its members is re-identifiable to within
    * fewer than k candidates, so the release action is `suppress` (the
    * standard remedy; generalizing the band is the other).
    *
    * The balance band is floor(acctbal/2000) — one IEEE divide + floor on
    * identical doubles in both engines, the established exact-replay
    * convention. One map-side-combined groupBy, QI-cardinality output:
    * scan-bound at any population size. */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5L
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000.0).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("group_n"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("group_n"),
        (col("group_n") < k).as("violates_k"),
        when(col("group_n") < k, "suppress").otherwise("release").as("action"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_band")
  }

  /** One audit row for a derived frame generation pair: counts both
    * generations, counts post-erasure residual key references, and
    * counts surviving rows whose derived columns changed. Each input is
    * aggregated once; the change count is one doc_id-keyed join. */
  private def frameAudit(name: String, before: DataFrame, after: DataFrame,
      residual: org.apache.spark.sql.Column,
      changed: (String => org.apache.spark.sql.Column,
                String => org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    val nBefore = before.agg(count(lit(1)).as("rows_before"))
    val nAfter = after.agg(count(lit(1)).as("rows_after"),
      sum(when(residual, 1L).otherwise(0L)).as("residual_refs"))
    val b = before.select(before.columns.map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(after.columns.map(c => col(c).as(s"__a_$c")): _*)
    val nChanged = b
      .join(a, col("__b_doc_id") === col("__a_doc_id"))
      .agg(sum(when(changed(c => col(s"__b_$c"), c => col(s"__a_$c")), 1L)
        .otherwise(0L)).as("n_changed"))
    nBefore.crossJoin(nAfter).crossJoin(nChanged)
      .select(lit(name).as("frame"),
        col("rows_before"), col("rows_after"),
        (col("rows_before") - col("rows_after")).as("purged"),
        coalesce(col("residual_refs"), lit(0L)).as("residual_refs"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"))
  }
}
