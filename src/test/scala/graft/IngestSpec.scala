package graft

import org.apache.spark.sql.functions._
import graft.ingest.IngestOps

/** Reference ETL ingest semantics (SURVEY.md §2.A `ingest_json_cards`):
  * null-on-invalid dates, closed-ENUM layout validation, decimal price
  * normalization, multiface image repair. */
class IngestSpec extends SparkSpec {

  private lazy val out = IngestOps.qIngestJsonCards(spark, SfDir).cache()

  test("ingest parses every synthesized card") {
    assert(out.count() == 500)
  }

  test("malformed dates (every 7th card) parse to null, valid ones don't") {
    val badDates = out.filter(col("released_date").isNull).count()
    assert(badDates == (500 + 6) / 7)
    assert(out.filter(col("released_date").isNotNull).count() == 500 - badDates)
  }

  test("out-of-domain layouts (every 11th card) are flagged invalid") {
    assert(out.filter(!col("layout_valid")).count() == (500 + 10) / 11)
    assert(out.filter(!col("layout_valid")).select("layout").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("weird"))
  }

  test("prices normalize to decimal(10,2), null when absent (every 5th)") {
    assert(out.filter(col("price_usd").isNull).count() == 500 / 5)
    assert(out.schema("price_usd").dataType.typeName == "decimal(10,2)")
  }

  test("missing top-level image (every 3rd card) is repaired from first face") {
    val repaired = out.filter(col("image_normal").startsWith("https://img/face_"))
    val direct = out.filter(col("image_normal").startsWith("https://img/card_"))
    assert(repaired.count() == (500 + 2) / 3)
    assert(repaired.count() + direct.count() == 500)
    // the repaired value is specifically face 0 of the same card
    assert(out.filter(col("id") === "card-3")
      .select("image_normal").head().getString(0) == "https://img/face_3_0.jpg")
  }
}
