package graft

/** Driver-contract invariants over the whole registered query surface —
  * the cross-cutting checks that individual operator specs can't own. */
class EntrySpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query impl: ${orphans.mkString(", ")}")
  }

  test("every oracle-gated query is non-vacuous at sf0.001") {
    // A filter matching zero rows hash-matches an empty oracle result and
    // passes the gate without verifying anything — so every oracle-gated
    // entry must return rows on the smallest test SF. The one by-design
    // exception: q_anti_join's oracle IS empty (the generated data has no
    // orphan customers); its non-vacuity is proven separately with planted
    // orphans in RelationalSpec.
    val names = (SparkEntry.oracleSql.keySet - "q_anti_join").toSeq.sorted
    val vacuous = names.filter(n => SparkEntry.queries(n)(spark, SfDir).isEmpty)
    assert(vacuous.isEmpty, s"vacuous oracle matches: ${vacuous.mkString(", ")}")
  }
}
