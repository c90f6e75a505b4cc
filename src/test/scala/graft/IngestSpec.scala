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
    // the driver query emits hash-portable integer cents; the full-width
    // ingest keeps the typed decimal
    assert(out.filter(col("price_cents").isNull).count() == 500 / 5)
    val full = IngestOps.ingestCards(IngestOps.syntheticRawCards(spark, 50))
    assert(full.schema("price_usd").dataType.typeName == "decimal(10,2)")
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

  test("keyword/color containment finds exactly the WU Keyword3 cards, non-vacuously") {
    val out = IngestOps.qCardsKeywordFilter(spark, SfDir).collect()
    assert(out.nonEmpty, "containment query matched zero rows — vacuous")
    // id%6==3 (Keyword3) and id%5<=1 (identity within {W,U})
    val expected = (0L until 500L).count(i => i % 6 == 3 && i % 5 <= 1)
    assert(out.length == expected, s"got ${out.length}, want $expected")
    out.foreach { r =>
      assert(r.getAs[String]("keywords").contains("Keyword3"))
      assert(r.getAs[String]("color_id").forall(c => c == 'W' || c == 'U'))
    }
  }

  test("text search matches by name-substring OR rules-text token, non-vacuously") {
    val out = IngestOps.qCardsTextSearch(spark, SfDir).collect()
    assert(out.nonEmpty, "text search matched zero rows — vacuous")
    // '%card 12%' on names: 12, 120..129; token '12.' in rules text: 12 only
    val ids = out.map(_.getAs[String]("id")).toSet
    assert(ids == (Set(12L) ++ (120L to 129L)).map(i => s"card-$i"), s"got $ids")
    assert(out.count(_.getAs[Boolean]("text_match")) == 1)
    assert(out.forall(_.getAs[Boolean]("name_match")))
  }

  test("cmc range scan returns exactly the cards with cmc in [2,4]") {
    val out = IngestOps.qCardsCmcRange(spark, SfDir).collect()
    // cmc = i % 12; residues 0..7 occur 42 times in [0,500), 8..11 occur 41
    val expected = (0L until 500L).count(i => i % 12 >= 2 && i % 12 <= 4)
    assert(out.length == expected, s"got ${out.length}, want $expected")
    assert(out.forall { r => val c = r.getAs[Double]("cmc"); c >= 2.0 && c <= 4.0 })
  }

  test("oracle_id point lookup returns both printings of oracle-42") {
    val out = IngestOps.qCardsOracleLookup(spark, SfDir).collect()
    // oracle_id = 'oracle-' || (i % 400): ids 42 and 442 share oracle-42
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("card-42", "card-442"))
    assert(out.forall(_.getAs[String]("oracle_id") == "oracle-42"))
  }

  test("file-source ingest equals the in-memory path and drops corrupt lines") {
    val fromFile = IngestOps.qIngestJsonCardsFile(spark, SfDir)
    val inMem = IngestOps.qIngestJsonCards(spark, SfDir)
    assert(fromFile.collect().toSeq == inMem.collect().toSeq,
      "file-read ingest diverged from the raw-column ingest")
    // the PERMISSIVE policy must SEE the 5 truncated lines (not silently
    // skip or fail the scan) and route them to _corrupt_record
    val dir = IngestOps.rawCardsJsonDir(spark)
    val parsed = spark.read
      .schema(IngestOps.CardSchema.add(
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    // materialize a data column alongside: Spark disallows queries whose
    // only referenced column is the internal corrupt-record column
    val corrupt = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("id"), col("_corrupt_record")).collect()
    assert(corrupt.length == 5)
    // several part files -> several scan splits (real split parallelism)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) >= 2)
    // and the registered entry PLANS a real json FileScan — this entry
    // exists precisely to exercise the file source, not from_json
    val plan = fromFile.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan json"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("ad-hoc SQL through sqlCatalog equals the DataFrame formulation, non-vacuously") {
    val viaSql = IngestOps.qSqlAdhoc(spark, SfDir)
    assert(viaSql.count() > 0, "README example query returned nothing")
    val cards = IngestOps.cardsCorpus(spark)
    val viaDf = cards.filter(col("layout") === "split")
      .join(IngestOps.setsCorpus(spark)
        .select(col("code"), col("name").as("__dim_set_name"),
          col("set_type").as("__dim_set_type")),
        cards("set") === col("code"))
      .select(cards("id"), cards("name"), cards("layout"), cards("rarity"),
        col("__dim_set_name").as("set_name"), col("__dim_set_type").as("set_type"))
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("schema drift: unknown fields survive ingest in the VARIANT _rest column") {
    val out = IngestOps.qIngestSchemaDrift(spark, SfDir).cache()
    assert(out.count() == 500)
    // drifted docs (every 4th) carry exactly the two novel fields, with
    // values queryable through variant_get; undrifted docs carry none
    val drifted = out.filter(col("n_rest_fields") > 0)
    assert(drifted.count() == 125)
    drifted.collect().foreach { r =>
      val i = r.getString(0).stripPrefix("card-").toLong
      assert(i % 4 == 0 && r.getLong(3) == 2L)
      assert(r.getLong(4) == i % 7, s"power_level mangled for card-$i")
      assert(r.getString(5) == s"t${i % 3}", s"scry_tags mangled for card-$i")
    }
    assert(out.filter(col("n_rest_fields") === 0)
      .filter(col("power_level").isNotNull || col("first_tag").isNotNull).count() == 0)
    // the typed pipeline is unaffected by drift (layout validation intact)
    assert(out.filter(!col("layout_valid")).count() == (500 + 10) / 11)
    // _rest holds ONLY drift: known keys are filtered even on drifted docs
    val restKeys = IngestOps.ingestCardsWithRest(
        IngestOps.syntheticRawCardsDrifted(spark, 100))
      .select(explode(map_keys(col("_rest"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(restKeys == Set("scry_power_level", "scry_tags"), s"got $restKeys")
    out.unpersist()
  }

  test("multiLine array-form dump parses to the same cards (unsplittable form)") {
    // a Scryfall dump is natively ONE json array; multiLine=true reads it
    // but cannot split the file — which is exactly why the ingest pipeline
    // standardizes on JSONL. Equivalence checked on a small array file.
    val raw = IngestOps.syntheticRawCards(spark, 50)
      .collect().map(_.getString(0)).mkString("[", ",\n", "]")
    val f = java.io.File.createTempFile("graft_cards_array", ".json")
    java.nio.file.Files.writeString(f.toPath, raw)
    val viaArray = spark.read.schema(IngestOps.CardSchema)
      .option("multiLine", "true").json(f.getAbsolutePath)
    val viaLines = IngestOps.syntheticRawCards(spark, 50)
      .select(from_json(col("raw"), IngestOps.CardSchema).as("c")).select(col("c.*"))
    assert(viaArray.orderBy("id").collect().toSeq ==
      viaLines.orderBy("id").collect().toSeq)
    f.delete()
  }

  test("CSV and ORC source paths equal the JSON file path row-for-row") {
    val viaJson = IngestOps.qIngestJsonCardsFile(spark, SfDir).collect().toSeq
    val viaCsv = IngestOps.qIngestCsvCards(spark, SfDir).collect().toSeq
    val viaOrc = IngestOps.qIngestOrcCards(spark, SfDir).collect().toSeq
    assert(viaJson.size == 500)
    assert(viaCsv == viaJson, "CSV source drifted from the JSON path")
    assert(viaOrc == viaJson, "ORC source drifted from the JSON path")
  }

  test("CSV corrupt lines land in _corrupt_record, non-vacuously") {
    import org.apache.spark.sql.types.{StringType, StructField}
    // read the materialized CSV dir raw: exactly the 5 planted malformed
    // rows must carry a corrupt record when the checked column is read
    val raw = spark.read
      .schema(IngestOps.csvReadSchema.add(StructField("_corrupt_record", StringType)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(IngestOps.rawCardsCsvDir(spark))
      .select("id", "cmc", "_corrupt_record")
    // collect with data columns referenced: a bare count() would prune to
    // only the corrupt column, which the CSV source disallows
    // cmc must survive into the collected projection: corruption is only
    // detected for columns the scan actually converts (column pruning)
    val corrupt = raw.filter(col("_corrupt_record").isNotNull)
      .select("id", "cmc", "_corrupt_record").collect()
    assert(corrupt.length == 5,
      "PERMISSIVE corrupt-record path is vacuous — no malformed rows detected")
    assert(raw.select("id", "cmc").collect().length == 505)
  }

  test("session corpus cache materializes once and serves repeat queries") {
    val a = IngestOps.cardsCorpus(spark)
    val b = IngestOps.cardsCorpus(spark)
    assert(a.count() == 500 && b.count() == 500)
    assert(spark.catalog.tableExists("graft_cards_corpus_500"))
    // cached plan must be a trivial scan, not the full ingest pipeline
    assert(!b.queryExecution.optimizedPlan.toString.contains("from_json"),
      "corpus cache is re-running the JSON parse")
  }

  test("q_cards_fuzzy_join golden plan: probe side broadcast, rank window per probe (VERDICT r9 ask #7)") {
    // the load-bearing plan facts: the probe postings (1/25 of the
    // catalog, a few hundred rows) must BROADCAST into the catalog
    // postings — a shuffle join would move the whole inverted index for
    // a tiny probe batch — and the best-match ranking must window by
    // probe_id (bounded groups), never an all-pairs string comparison
    val df = graft.ingest.IngestOps.qCardsFuzzyJoin(spark, SfDir)
    df.collect() // AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"postings join is not broadcast:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "fuzzy join fell back to an all-pairs comparison")
    val specs = plan.split("windowspecdefinition\\(").drop(1)
    assert(specs.nonEmpty && specs.forall(_.take(80).contains("probe_id")),
      s"rank window is not probe-partitioned: ${specs.map(_.take(80)).mkString(" | ")}")
  }

  test("fuzzy join recovers the typo'd source for most probes, never trivially") {
    val rows = graft.ingest.IngestOps.qCardsFuzzyJoin(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20, "one best match per probe")
    val recovered = rows.count { case (p, m, _, _) => p == m }
    // the planted space->x typo keeps number trigrams intact: the true
    // source must win for the large majority (prefix cousins take a few)
    assert(recovered >= 15, s"only $recovered/20 probes recovered their source")
    assert(recovered < 20, "perfect recovery — the typo is not perturbing anything")
    rows.foreach { case (_, _, inter, bp) =>
      assert(inter >= 2 && bp > 2000, "a best match with near-zero overlap") }
  }

  test("events JSONL round-trip: microsecond parity holds, the junk line goes corrupt") {
    val row = IngestOps.qIngestEventsJsonl(spark, SfDir).head()
    val (nRows, nParsed, nCorrupt, parity) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3))
    val n = Tables.events(spark, SfDir).count()
    assert(nRows == n && nParsed == n, s"JSONL round-trip lost rows: $nParsed/$n")
    assert(nCorrupt == 1L, s"planted junk line: $nCorrupt corrupt rows, expected 1")
    assert(parity, "multiset parity with the parquet truth broken")
    // the parity is not vacuous: the corpus genuinely carries sub-second
    // timestamp precision the default millis format would truncate
    val subMillis = Tables.events(spark, SfDir)
      .filter(expr("cast(date_format(ts, 'SSSSSS') as long) % 1000 <> 0")).count()
    assert(subMillis > 0, "no sub-millisecond timestamps — precision parity untested")
  }
}
