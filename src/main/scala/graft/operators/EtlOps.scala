package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Validation / normalization / semi-structured-field operators
  * (SURVEY.md §2.A), re-expressing the reference's per-card processing:
  * closed-domain ENUM validation (/root/reference/import_cards.py:29-34,
  * 186-189), null-on-invalid date parsing (:150-157), JSONB path queries
  * (README.md JSONB columns), and repairing a missing top-level field from
  * a nested array (:191-198).
  *
  * Everything here is `functions._` column algebra — fully codegen'd,
  * no UDFs, so each op rides inside WholeStageCodegen at any scale.
  */
object EtlOps {

  /** Closed-domain validation: flag rows whose `valueCol` falls outside the
    * allowed set (the reference warns and keeps the row; we flag). */
  def validateEnum(df: DataFrame, valueCol: String, allowed: Seq[String]): DataFrame =
    df.withColumn("is_valid", col(valueCol).isin(allowed: _*))

  /** Null-on-invalid date parsing (reference parse_date). `try_to_date`
    * returns null for malformed input (ANSI-safe) — exactly the reference's
    * try/except ValueError. */
  def parseDateSafe(df: DataFrame, strCol: String, out: String, fmt: String = "yyyy-MM-dd"): DataFrame =
    df.withColumn(out, expr(s"try_to_date($strCol, '$fmt')"))

  /** Repair a missing top-level value from a nested array-of-structs
    * (reference: aggregate image_uris from card_faces when absent). */
  def coalesceFromNested(df: DataFrame, topCol: String, nestedArrayCol: String, field: String): DataFrame =
    df.withColumn(topCol,
      coalesce(col(topCol), element_at(col(nestedArrayCol), 1).getField(field)))

  // ---- driver-contract queries over the testdata ----

  /** ENUM validation rollup on order priorities, with the allowed domain
    * deliberately excluding two real values so both branches appear. */
  def qEnumValidate(spark: SparkSession, dir: String): DataFrame = {
    val allowed = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    validateEnum(Tables.orders(spark, dir), "o_orderpriority", allowed)
      .groupBy(col("o_orderpriority"), col("is_valid"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Round-trip date parse with deliberate corruption: every 7th order's
    * date string is garbage and must parse to null. */
  def qDateParseSafe(spark: SparkSession, dir: String): DataFrame = {
    val withStr = Tables.orders(spark, dir)
      .withColumn("date_str",
        when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
    parseDateSafe(withStr, "date_str", "parsed_date")
      .select(col("o_orderkey"), col("parsed_date"))
      .orderBy("o_orderkey")
  }

  /** JSONB-style path extraction from the events `props` JSON column,
    * rolled up per event type. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** JSONB-style extraction via Spark 4's VARIANT type: `parse_json` once,
    * then typed `variant_get` path access — the modern engine path for
    * repeated access into semi-structured columns (single parse, binary
    * encoding, pushdown-friendly), vs per-path string re-parsing in
    * get_json_object. Same result contract as qJsonExtract. */
  def qJsonVariant(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Nested-repair demo shaped like the reference's multiface fix: a
    * synthesized `faces` array-of-structs supplies the image when the
    * top-level value is null (here: every 3rd event). The array is built
    * with native struct constructors — the operator under test is the
    * nested-array repair ([[coalesceFromNested]]), and a JSON
    * serialize/re-parse round-trip would only add two string passes per
    * row to the same plan. */
  def qCoalesceNested(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .withColumn("top_img",
        when(col("k") % 3 === 0, lit(null.asInstanceOf[String]))
          .otherwise(concat(lit("img_"), col("k"))))
      .withColumn("faces", array(
        struct(concat(lit("face_"), col("k"), lit("_0")).as("img")),
        struct(concat(lit("face_"), col("k"), lit("_1")).as("img"))))
    coalesceFromNested(ev, "top_img", "faces", "img")
      .select(col("event_id"), col("top_img"))
      .orderBy("event_id")
  }

  /** Rule-based data-quality report over orders — the dbt-test /
    * Great-Expectations contract sweep every ingestion gate runs before
    * promoting a drop: primary-key uniqueness, referential integrity to
    * the customer dimension, a closed accepted-values domain, a range
    * rule, and a not-null rule, each reported as (rule, violations,
    * rows_checked, passed). The accepted-values rule deliberately
    * excludes the real `P` status so the report carries genuine failure
    * traffic; the reference's ingest has the same shape inline
    * (import_cards.py:29-34 ENUM guard + ON CONFLICT key discipline).
    *
    * Scale shape: four of the five rules fold into ONE map-side-combined
    * scan (conditional aggs + one distinct count — the pk rule's exact
    * ndv is the knowingly-priced part, `q_hll_distinct`'s sketch is the
    * fleet swap); the FK rule is a broadcast-able left-anti join against
    * the dimension's key column only. The report frame itself is five
    * rows exploded from the single agg row — no data re-scan. */
  def qDqRules(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val aggRow = o.agg(
      count(lit(1)).cast("long").as("n_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).cast("long").as("v_pk"),
      sum(when(!col("o_orderstatus").isin("O", "F"), 1L).otherwise(0L))
        .cast("long").as("v_status"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).cast("long").as("v_price"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).cast("long").as("v_nulldate"))
    val fkRow = o.select(col("o_custkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("v_fk"))
    aggRow.crossJoin(fkRow)
      .select(col("n_rows"), explode(array(
        struct(lit("fk_custkey_in_customer").as("rule"), col("v_fk").as("violations")),
        struct(lit("orderdate_not_null").as("rule"), col("v_nulldate").as("violations")),
        struct(lit("pk_unique_orderkey").as("rule"), col("v_pk").as("violations")),
        struct(lit("status_in_accepted_set").as("rule"), col("v_status").as("violations")),
        struct(lit("totalprice_positive").as("rule"), col("v_price").as("violations")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("n_rows"), (col("r.violations") === 0L).as("passed"))
      .orderBy("rule")
  }
}
