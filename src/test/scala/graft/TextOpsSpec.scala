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
}
