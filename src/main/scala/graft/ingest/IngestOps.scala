package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.EtlOps

/** Schema-driven semi-structured ingest (SURVEY.md §2.A,
  * `ingest_json_cards`), re-expressing the reference's card pipeline:
  * streaming JSON → typed 67-column schema (/root/reference/import_cards.py
  * :58-127), null-on-invalid date parse (:150-157), decimal normalization
  * (:159-172), closed-ENUM layout validation (:29-34,186-189), and
  * multiface image repair (:191-198).
  *
  * Spark-first shape: `from_json` against an explicit schema — a narrow,
  * codegen'd map over the raw strings. On a cluster the same plan runs on
  * `spark.read.json`/`.text` file sources with the scan parallelized by
  * split; here the raw JSON is synthesized deterministically so the
  * operator is testable without fixture files.
  */
object IngestOps {

  /** The reference's closed layout domain (subset; import_cards.py:29-34). */
  val AllowedLayouts: Seq[String] = Seq(
    "normal", "split", "flip", "transform", "modal_dfc", "meld",
    "leveler", "saga", "adventure", "token", "emblem", "planar")

  /** Typed target schema for the card subset we ingest (mirrors the
    * reference's init.sql core columns; nested objects stay structs). */
  val CardSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("released_at", StringType),
    StructField("layout", StringType),
    StructField("cmc", DoubleType),
    StructField("prices", StructType(Seq(
      StructField("usd", StringType),
      StructField("eur", StringType)))),
    StructField("image_uris", StructType(Seq(
      StructField("normal", StringType)))),
    StructField("card_faces", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("image_uris", StructType(Seq(
        StructField("normal", StringType))))))))
  ))

  /** Deterministic Scryfall-shaped raw JSON corpus: every 7th card has a
    * malformed date, every 11th an out-of-domain layout, every 3rd no
    * top-level image (faces only), every 5th no usd price. */
  def syntheticRawCards(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val date = when(id % 7 === 0, lit("not-a-date"))
      .otherwise(concat(lit("19"), lpad((id % 30 + 70).cast("string"), 2, "0"),
        lit("-0"), (id % 9 + 1).cast("string"), lit("-1"), (id % 9).cast("string")))
    val layout = when(id % 11 === 0, lit("weird"))
      .otherwise(element_at(array(AllowedLayouts.map(lit): _*), (id % AllowedLayouts.size).cast("int") + 1))
    val usd = when(id % 5 === 0, lit("null"))
      .otherwise(concat(lit("\""), (id % 300).cast("string"), lit("."), lpad((id % 100).cast("string"), 2, "0"), lit("\"")))
    val topImage = when(id % 3 === 0, lit("null"))
      .otherwise(concat(lit("""{"normal":"https://img/card_"""), id, lit(""".jpg"}""")))
    spark.range(n).select(concat(
      lit("""{"id":"card-"""), id,
      lit("""","name":"Card """), id,
      lit("""","released_at":""""), date,
      lit("""","layout":""""), layout,
      lit("""","cmc":"""), (id % 12).cast("string"),
      lit(""","prices":{"usd":"""), usd, lit(""","eur":"1.00"}"""),
      lit(""","image_uris":"""), topImage,
      lit(""","card_faces":[{"name":"Front","image_uris":{"normal":"https://img/face_"""), id,
      lit("""_0.jpg"}},{"name":"Back","image_uris":{"normal":"https://img/face_"""), id,
      lit("""_1.jpg"}}]}""")).as("raw"))
  }

  /** Full ingest pipeline over a raw-JSON-string column: parse → typed
    * columns → date/decimal normalization → enum validation → multiface
    * image repair. Pure column algebra, no UDFs. */
  def ingestCards(raw: DataFrame): DataFrame = {
    val parsed = raw
      .select(from_json(col("raw"), CardSchema).as("c"))
      .select(col("c.*"))
    val dated = EtlOps.parseDateSafe(parsed, "released_at", "released_date")
    val repaired = dated
      .withColumn("price_usd", expr("try_cast(prices.usd as decimal(10,2))"))
      .withColumn("layout_valid", col("layout").isin(AllowedLayouts: _*))
      // reference import_cards.py:191-198 — missing top-level image_uris is
      // repaired from the first card face
      .withColumn("image_normal",
        coalesce(col("image_uris.normal"), element_at(col("card_faces"), 1).getField("image_uris").getField("normal")))
    repaired.select(
      col("id"), col("name"), col("released_date"), col("layout"),
      col("layout_valid"), col("cmc"), col("price_usd"), col("image_normal"),
      size(col("card_faces")).as("n_faces"))
  }

  /** Driver-contract query (rows-only: input is synthesized JSON, not a
    * parquet table; exact semantics asserted in IngestSpec). */
  def qIngestJsonCards(spark: SparkSession, dir: String): DataFrame =
    ingestCards(syntheticRawCards(spark, 500)).orderBy("id")
}
