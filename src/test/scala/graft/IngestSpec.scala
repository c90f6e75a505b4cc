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

  test("ingest carries the reference's full 68-column cards schema") {
    // the init.sql cards table defines 68 columns (import_cards.py's
    // `columns` list matches); every one must survive the parse as a typed
    // column (plus the 5 derived analysis columns)
    val full = IngestOps.ingestCards(IngestOps.syntheticRawCards(spark, 50))
    assert(IngestOps.CardSchema.fields.length == 68,
      s"schema width ${IngestOps.CardSchema.fields.length}")
    val expected = IngestOps.CardSchema.fieldNames.toSet ++
      Set("released_date", "layout_valid", "price_usd", "image_normal", "n_faces")
    assert(full.columns.toSet == expected,
      s"missing: ${expected -- full.columns.toSet}; extra: ${full.columns.toSet -- expected}")
    // JSONB-shaped columns landed as TYPED Spark columns, not strings
    assert(full.schema("colors").dataType.typeName == "array")
    assert(full.schema("legalities").dataType.typeName == "map")
    assert(full.schema("prices").dataType.typeName == "struct")
    assert(full.schema("card_faces").dataType.typeName == "array")
  }

  test("all 24 allowed layout values occur and validate true") {
    assert(IngestOps.AllowedLayouts.size == 24)
    val seen = out.filter(col("layout_valid")).select("layout").distinct()
      .collect().map(_.getString(0)).toSet
    assert(seen == IngestOps.AllowedLayouts.toSet,
      s"missing layouts: ${IngestOps.AllowedLayouts.toSet -- seen}")
  }

  test("sets dimension ingests all 14 columns with safe dates") {
    val sets = IngestOps.ingestSets(IngestOps.syntheticRawSets(spark))
    assert(IngestOps.SetSchema.fields.length == 14)
    assert(sets.count() == IngestOps.NSets)
    // every 7th set has a bogus released_at -> null date, others parse
    assert(sets.filter(col("released_date").isNull).count() == (IngestOps.NSets + 6) / 7)
    assert(sets.schema("card_count").dataType.typeName == "integer")
  }

  test("cards-per-set star query joins every card to exactly one set") {
    val out = IngestOps.qCardsPerSet(spark, SfDir)
    assert(out.count() == IngestOps.NSets)
    val total = out.agg(sum("n_cards")).head.getLong(0)
    assert(total == 500, s"join dropped/duplicated cards: $total")
  }
}
