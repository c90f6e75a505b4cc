package graft

import org.apache.spark.sql.functions._
import graft.sources.DedupIndexStore

/** Contracts of the persisted MinHash/LSH dedup index that the
  * dedup_index_serve oracle can't express: append-built ≡
  * rebuilt-from-scratch (signatures are deterministic, banding is
  * frozen), and the corpus-snapshot staleness gate. */
class DedupIndexSpec extends SparkSpec {

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_dedup_idx_spec_$tag").toString
    graft.sources.LakeTable.deleteRecursively(new java.io.File(p))
    p
  }

  test("append-built index is row-identical to a from-scratch rebuild, probes agree") {
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val cls = col("doc_id") % 7
    val base = docs.filter(cls =!= 3 && cls =!= 5)
    val batchA = docs.filter(cls === 5)
    val probes = docs.filter(cls === 3)

    val grown = freshPath("grown")
    DedupIndexStore.write(spark, SfDir, grown, base)
    DedupIndexStore.append(spark, SfDir, grown, batchA)
    val scratch = freshPath("scratch")
    DedupIndexStore.write(spark, SfDir, scratch, base.unionByName(batchA))

    def postings(p: String) = spark.read.parquet(s"$p/postings.parquet")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(postings(grown) == postings(scratch),
      "append produced different postings than a rebuild — banding not frozen")

    def decisions(p: String) = DedupIndexStore.probe(spark, SfDir, p, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = decisions(grown)
    assert(d == decisions(scratch))
    assert(d.nonEmpty, "no verified near-dup pair — probe vacuous at this SF")
  }

  test("entry emits append-generation hits and novelty; probing a stale index fails loudly") {
    val out = graft.dedup.DedupOps.qDedupIndexServe(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.exists(_._2 > 0), "no probe doc matched the index — gate vacuous")
    assert(out.exists(_._3 > 0),
      "no probe doc matched the APPENDED generation — the append path is untested")
    assert(out.exists(_._4 == 1L), "every probe doc was a dup — novelty branch untested")
    out.foreach { case (id, n, nApp, novel) =>
      assert(nApp <= n && (novel == 1L) == (n == 0L), s"inconsistent row for doc $id")
    }
    // the staleness gate: an index built over THIS corpus must refuse
    // probes resolved against a different one
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_dedup_idx_${graft.SessionCache.dirKey(SfDir)}").toString
    val err = intercept[IllegalStateException] {
      DedupIndexStore.probe(spark, "/root/testdata/sf0.01", path,
        Tables.documents(spark, SfDir).select("doc_id", "text").limit(1))
    }
    assert(err.getMessage.contains("DIFFERENT corpus"))
  }
}
