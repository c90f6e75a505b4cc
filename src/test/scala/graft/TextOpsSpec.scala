package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Text-analysis contracts (SURVEY.md §2.D) beyond the DuckDB oracles. */
class TextOpsSpec extends SparkSpec {

  test("doc fingerprint is deterministic and collision-free on the corpus") {
    val a = TextOps.qDocFingerprint(spark, SfDir).collect().toSeq
    val b = TextOps.qDocFingerprint(spark, SfDir).collect().toSeq
    assert(a == b)
    val n = Tables.documents(spark, SfDir).select("text").distinct().count()
    val fps = TextOps.qDocFingerprint(spark, SfDir).select("fingerprint").distinct().count()
    assert(fps == n, s"fingerprint collisions: $fps distinct for $n texts")
  }

  test("bigrams of sub-2-token docs are empty, not a runtime error") {
    import spark.implicits._
    val out = Seq("solo", "", "  ", "two words", "a b c")
      .toDF("text")
      .select(explode_outer(TextOps.bigrams(TextOps.wsTokens(col("text")))).as("bigram"))
      .filter(col("bigram").isNotNull)
      .as[String].collect().toSeq.sorted
    assert(out == Seq("a b", "b c", "two words"))
  }

  test("lang-id argmax policy is deterministic: same hits → same prediction") {
    val out = TextOps.qLangId(spark, SfDir)
    // prediction is a pure function of the text → equal texts equal preds
    assert(out.count() == Tables.documents(spark, SfDir).count())
    val preds = out.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("stratified sample is deterministic and rate-faithful per stratum") {
    val a = TextOps.qStratifiedSample(spark, SfDir).collect()
    val b = TextOpsSpecHelper.rerun(spark, SfDir)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "sample not reproducible")
    assert(a.forall { r =>
      val cap = if (r.getString(1) == "en") 32 else 64
      r.getAs[Long]("bucket") < cap
    })
    // keep rates land near the configured 32/128 and 64/128 (±50% slack on
    // a small corpus: the buckets are hash-uniform, not exact quotas)
    val total = Tables.documents(spark, SfDir)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    kept.foreach { case (lang, n) =>
      val expect = total(lang) * (if (lang == "en") 32.0 else 64.0) / 128.0
      assert(n > expect * 0.5 && n < expect * 1.5, s"$lang kept $n, expected ~$expect")
    }
  }
}

/** Fresh invocation for the determinism check (no shared plan objects). */
object TextOpsSpecHelper {
  def rerun(spark: org.apache.spark.sql.SparkSession, dir: String) =
    TextOps.qStratifiedSample(spark, dir).collect()
}
