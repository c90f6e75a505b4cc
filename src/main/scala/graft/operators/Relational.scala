package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational analytics core (SURVEY.md §2.B).
  *
  * Re-expresses the reference's downstream SQL query surface
  * (/root/reference/README.md:18 — filter/join/aggregate over the imported
  * star schema) as declarative DataFrame plans. Every query is a pure
  * function of (session, data dir); filters and projections are written so
  * Catalyst pushes them into the parquet scan, and all money/double
  * aggregates are rounded to fixed decimals for oracle-stable hashing.
  *
  * Scale notes: dimension tables (region/nation/supplier/part/customer at
  * TPC-H proportions) are broadcast; fact-fact joins shuffle on their join
  * key and rely on AQE for skew splitting; nothing collects to the driver.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: multi-aggregate groupBy with a
    * pushed-down date filter. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-style shipping priority: 3-way join, aggregate, top-10 with
    * deterministic tiebreak. Customer is broadcast-sized relative to the
    * fact tables at every scale factor. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-03-15"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume: snowflake join across six
    * tables with the dimension chain broadcast. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li   = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q4-style: orders in a quarter having at least one returned
    * lineitem (the testdata carries no commit/receipt dates, so the
    * EXISTS predicate uses the return flag) — date-range filter +
    * left_semi against the fact table. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
    val late = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-style forecast revenue: pure scan-side filter + single
    * aggregate — the pushdown/codegen microbenchmark. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q10-style returned-item reporting: revenue lost to returns per
    * customer — lineitem('R') ⋈ orders ⋈ customer ⋈ nation, top 20. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Full-outer join coverage: big spenders (orders sum > threshold) vs
    * positive-balance customers — rows classified matched / order-only /
    * customer-only via null probes, aggregated per class. */
  def qFullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val spenders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(sum("o_totalprice").as("spend"))
      .filter(col("spend") > 400000.0)
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    spenders.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
      .withColumn("side",
        when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
          .when(col("c_custkey").isNull, "spender_only")
          .otherwise(lit("rich_only")))
      .groupBy("side")
      .agg(count(lit(1)).as("n"),
        round(sum(coalesce(col("spend"), lit(0.0))), 2).as("total_spend"))
      .orderBy("side")
  }

  /** Cross join of the two smallest dims — cartesian coverage with an
    * aggregate so the result is tiny and deterministic. */
  def qCrossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).crossJoin(Tables.nation(spark, dir))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("n_nationkey")).as("n_nations"))
      .orderBy("r_name")

  /** Aggregate + HAVING: order priorities whose order count crosses a
    * threshold. */
  def qGroupByHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .filter(col("n_orders") > 10)
      .orderBy("o_orderpriority")

  /** Explicit broadcast fact⋈dim join: part is always dimension-sized, so
    * the join is shuffle-free on the fact side. */
  def qBroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum("l_extendedprice"), 2).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("p_brand")
  }

  /** EXISTS via left_semi: customers that placed at least one big order.
    * Semi joins never duplicate the left side; the probe side is projected
    * to its join key and broadcast (the >300k filter is selective, and a
    * semi join only needs key existence — a distinct key set, not rows),
    * so the customer side is never shuffled at all. With an unselective
    * probe side, drop the hint and let the shuffle + AQE plan it. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val big  = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    cust.join(broadcast(big.select("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** NOT EXISTS via left_anti: customers with no orders at all. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Exact distinct aggregation (expands to a two-phase shuffle;
    * partial aggregation keeps the first shuffle narrow). */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows")
      )
      .orderBy("l_returnflag")

  /** HyperLogLog approximate distinct — the 100 TB answer to
    * countDistinct. Sketches merge associatively, so this is a single
    * narrow shuffle regardless of cardinality.
    *
    * Tolerance-gated: the HLL estimates are implementation-defined (not
    * reproducible in another engine), so the output carries the EXACT
    * counts (hash-checked against DuckDB) plus per-estimate bound
    * booleans |approx − exact| ≤ 5%·exact, which the oracle asserts as
    * literal TRUE — an estimate drifting out of its error contract breaks
    * the gate hash. HLL is deterministic for fixed data, so the gate is
    * not flaky. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    def ok(approx: Column, exact: Column): Column =
      abs(approx - exact) <= exact * 0.05
    // NOT countDistinct-alongside-HLL in one agg: planning two distinct
    // aggregates plus sketches goes through Expand (row multiplication +
    // a two-level composite-key aggregate — benched 5x slower). Instead
    // tag+explode the two key families and pre-dedup per (status, tag,
    // key) with an ordinary narrow agg; the exact count is then a plain
    // count, and HLL over the deduped keys yields the identical estimate
    // (same distinct set => same registers). One scan, no Expand.
    val tagged = Tables.lineitem(spark, dir).select(col("l_linestatus"),
      explode(array(
        struct(lit(0).as("tag"), col("l_partkey").as("k")),
        struct(lit(1).as("tag"), col("l_orderkey").as("k")))).as("tk"))
      .select(col("l_linestatus"), col("tk.tag").as("tag"), col("tk.k").as("k"))
      // count(DISTINCT k) ignores NULL keys; the groupBy rewrite would
      // keep the null group as one distinct value. TPC-H keys are
      // non-null so this is latent, but the rewrite must not change
      // semantics the day a nullable key lands here.
      .where(col("k").isNotNull)
    val wide = tagged
      .groupBy(col("l_linestatus"), col("tag"), col("k"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("l_linestatus"), col("tag"))
      .agg(count(lit(1)).as("exact"),
        approx_count_distinct(col("k"), 0.02).as("approx"))
      .groupBy(col("l_linestatus")).agg(
        max(when(col("tag") === 0, col("exact"))).as("exact_parts"),
        max(when(col("tag") === 1, col("exact"))).as("exact_orders"),
        max(when(col("tag") === 0, col("approx"))).as("ap"),
        max(when(col("tag") === 1, col("approx"))).as("ao"))
    wide.select(col("l_linestatus"), col("exact_parts"), col("exact_orders"),
        ok(col("ap"), col("exact_parts")).as("parts_ok"),
        ok(col("ao"), col("exact_orders")).as("orders_ok"))
      .orderBy("l_linestatus")
  }

  /** ROLLUP region→nation hierarchy over customer balances. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir)
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Pivot: return-flag columns per line status. Implemented with an
    * explicit value list so the plan needs no discovery pass. */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")

  /** Fixed-width value histogram of order prices (integer bucket ids and
    * counts — no float comparisons anywhere). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Exact interpolated quantiles by two-pass histogram refinement — no
    * whole-group buffering anywhere. `percentile()` collects every group
    * value into one aggregation task's heap (~1e9 values/group at 100x —
    * a scale-killer), and even a rank-over-distinct-values window leaves
    * one task sorting a whole near-unique group. This instead:
    *
    *  1. Pass 1 counts rows per (group, family, log-bucket). Buckets are
    *     `floor(sign(v)·ln(1+|v|)·512)` — order-preserving, needs no
    *     min/max pre-pass, and bounded (~355 buckets per binade), so the
    *     shuffle and driver collect are O(groups × families × buckets)
    *     regardless of row count.
    *  2. The driver turns cumulative bucket counts into, per requested p,
    *     the two covering ranks `floor/ceil(p·(n-1))`, their buckets, and
    *     each bucket's preceding-rank offset — metadata, like the IVF
    *     quantizer split, never row data.
    *  3. Pass 2 broadcast-joins rows to those covering buckets (~n/buckets
    *     rows per group survive), ranks within each tiny bucket, picks the
    *     straddling pair, and interpolates with the exact
    *     `(hi-pos)·v_lo + (pos-lo)·v_hi` formula Spark's `Percentile`
    *     uses, so results are bit-identical (spec-asserted).
    *
    * Both passes parallelize over scan splits at any scale; per-task state
    * is one ~buckets-sized count map. Contract: group cardinality is
    * bounded (the per-group quantile list lives on the driver) — the
    * documented high-cardinality path is [[qApproxPercentiles]]. Bucket
    * monotonicity relies on value spacing ≫ 1 ulp of `ln` (integers and
    * fixed-decimal data; not adjacent raw doubles). */
  /** Pass-1 bucket histograms memoized per caller-supplied key (dir
    * snapshot + family id): [[qPercentiles]] and [[qApproxPercentiles]]
    * share byte-identical histograms over the same families, so the
    * second query's first pass is served from the memo — the
    * session-amortized-state pattern (dedup pair mining, IVF quantizer).
    * ~groups x families x buckets rows, data not session-bound. */
  private val histMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[org.apache.spark.sql.Row]]()
  /** Entries are keyed by dir SNAPSHOT, so a rewritten dir (ScalingBench
    * amplify-into-scratch) strands its old key forever; each stranded
    * array can reach the 4e6-cell guard. Bound the memo instead of letting
    * one JVM accumulate every scale step's histograms. */
  private val histMemoMax = 8
  private def memoizedHist(key: String, build: () => Array[org.apache.spark.sql.Row]) = {
    if (histMemo.size >= histMemoMax && !histMemo.containsKey(key)) histMemo.clear()
    histMemo.computeIfAbsent(key, _ => build())
  }

  private[graft] def exactQuantilesByRank(
      df: DataFrame, groupCol: String,
      specs: Seq[(Column, Seq[(String, Double)])],
      histKey: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    def bucketOf(v: Column): Column =
      floor(signum(v) * log(abs(v) + lit(1.0)) * lit(512.0)).cast("long")
    // values ride as doubles: quantity already is one, integer cents are
    // exact in double up to 2^53; nulls are dropped (percentile semantics)
    val tagged = df.select(col(groupCol).as("g"), explode(array(
      specs.zipWithIndex.map { case ((v, _), i) =>
        struct(lit(i).as("tag"), v.cast("double").as("v"))
      }: _*)).as("tv"))
      .select(col("g"), col("tv.tag").as("tag"), col("tv.v").as("v"))
      .where(col("v").isNotNull)
      .withColumn("bucket", bucketOf(col("v")))
    def collectHist(): Array[Row] = tagged
      .groupBy(col("g"), col("tag"), col("bucket"))
      .agg(count(lit(1)).as("cnt")).collect()
    val hist = histKey match {
      case Some(k) => memoizedHist(k, () => collectHist())
      case None => collectHist()
    }
    require(hist.length <= 4000000,
      s"exactQuantilesByRank: ${hist.length} (group, family, bucket) cells —" +
        " group cardinality too high for exact grouped quantiles; use the" +
        " sketch path (qApproxPercentiles) instead")
    // driver: per (group, family) cumulative counts -> covering ranks
    val targets = hist.groupBy(r => (r.get(0), r.getInt(1))).toSeq.flatMap {
      case ((g, tag), cells) =>
        val sorted = cells.sortBy(_.getLong(2))
        val n = sorted.map(_.getLong(3)).sum
        val cumBefore = sorted.scanLeft(0L)(_ + _.getLong(3))
        specs(tag)._2.flatMap { case (name, p) =>
          val pos = p * (n - 1).toDouble
          val loRank = math.floor(pos).toLong
          val hiRank = math.ceil(pos).toLong
          // one row per DISTINCT covering bucket (lo and hi usually share
          // one): a duplicate (g, tag, bucket, name) row would fan out the
          // join and double-count row_number
          Seq(loRank, hiRank).distinct
            .map(r => sorted.indices.find(i => cumBefore(i + 1) > r).get)
            .distinct.map { b =>
              Row(g, tag, sorted(b).getLong(2), cumBefore(b), name, pos,
                loRank, hiRank)
            }
        }
    }
    val gType = df.schema(df.schema.fieldIndex(groupCol)).dataType
    val tSchema = StructType(Seq(
      StructField("g", gType), StructField("tag", IntegerType),
      StructField("bucket", LongType), StructField("cum_before", LongType),
      StructField("name", StringType), StructField("pos", DoubleType),
      StructField("lo_rank", LongType), StructField("hi_rank", LongType)))
    val targetDf = spark.createDataFrame(
      new java.util.ArrayList[Row](targets.asJava), tSchema)
    // pass 2: only rows in a covering bucket survive the broadcast probe
    val picked = tagged.join(broadcast(targetDf), Seq("g", "tag", "bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g", "tag", "name", "bucket").orderBy("v")))
      .withColumn("grank", col("cum_before") + col("rn") - 1)
      .where(col("grank") === col("lo_rank") || col("grank") === col("hi_rank"))
      .groupBy(col("g"), col("name"))
      .agg(first("pos").as("pos"),
        first("lo_rank").as("lo_rank"), first("hi_rank").as("hi_rank"),
        max(when(col("grank") === col("lo_rank"), col("v"))).as("v_lo"),
        max(when(col("grank") === col("hi_rank"), col("v"))).as("v_hi"))
      // loud fallback, not a silent null: if the rank probe ever misses
      // its covering bucket (the documented failure mode is a bucket map
      // whose float `ln` breaks monotonicity between pass 1 and pass 2),
      // v_lo/v_hi come back NULL and the interpolation would emit NULL as
      // if it were a quantile. raise_error costs nothing on healthy rows
      // (`when` evaluates it only on a miss).
      .withColumn("q",
        when(col("v_lo").isNull || col("v_hi").isNull, raise_error(concat(
          lit("exactQuantilesByRank: covering-bucket rank probe missed for group="),
          col("g").cast("string"), lit(", quantile="), col("name"),
          lit(" — bucket map non-monotone over this data; use the sketch path"))).cast("double"))
        .otherwise(when(col("lo_rank") === col("hi_rank"), col("v_lo"))
          .otherwise(
            (col("hi_rank").cast("double") - col("pos")) * col("v_lo") +
              (col("pos") - col("lo_rank").cast("double")) * col("v_hi"))))
    val names = specs.flatMap(_._2.map(_._1))
    val outCols = names.map(n => max(when(col("name") === n, col("q"))).as(n))
    picked.groupBy(col("g").as(groupCol)).agg(outCols.head, outCols.tail: _*)
  }

  /** Exact interpolated percentiles per group (median + p90), computed
    * rank-based (see [[exactQuantilesByRank]]) so no task ever buffers a
    * whole group. The price median is computed in integer cents: the
    * interpolated midpoint of two ints is exact in double, so no rounding
    * is needed and the oracle hash is stable (a 2-decimal median lands on
    * .xx5 halfway points where engines' double rounding disagrees). */
  /** Shared pass-1 memo key: [[qPercentiles]] and [[qApproxPercentiles]]
    * histogram the SAME (group, family) structure over lineitem, so their
    * bucket counts are byte-identical regardless of which quantiles each
    * extracts. */
  private def liHistKey(dir: String): String =
    s"lineitem:l_returnflag:qty+cents:$dir@${Tables.snapshot(s"$dir/lineitem.parquet")}"

  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    exactQuantilesByRank(Tables.lineitem(spark, dir), "l_returnflag", Seq(
      col("l_quantity") ->
        Seq("median_qty_raw" -> 0.5, "p90_qty_raw" -> 0.9),
      expr("cast(round(l_extendedprice * 100) as bigint)") ->
        Seq("median_price_raw" -> 0.5)), Some(liHistKey(dir)))
      .select(col("l_returnflag"),
        round(col("median_qty_raw"), 2).as("median_qty"),
        round(col("p90_qty_raw"), 2).as("p90_qty"),
        col("median_price_raw").as("median_price_cents"))
      .orderBy("l_returnflag")

  /** Sketch percentiles — the 100 TB path for qPercentiles: t-digest-style
    * approx_percentile merges associatively (one narrow shuffle, bounded
    * memory) where exact percentile buffers whole groups.
    *
    * Tolerance-gated: approx_percentile returns an actual data value whose
    * rank is within n/accuracy of the target, so with accuracy 1000 the
    * estimate must lie between the exact quantiles at p±0.01 (10× the
    * contract). The output carries the exact quantiles (hash-checked
    * against DuckDB's quantile_cont) plus bound booleans the oracle
    * asserts as literal TRUE; the bounds come from the same two-pass
    * histogram refinement as [[qPercentiles]], so no whole-group buffer
    * enters this plan either. Deterministic for fixed data — not flaky. */
  def qApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val approx = li.groupBy(col("l_returnflag")).agg(
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("a_qty"),
      expr("cast(round(approx_percentile(l_extendedprice, 0.5, 1000) * 100) as bigint)")
        .as("a_p50"),
      expr("cast(round(approx_percentile(l_extendedprice, 0.9, 1000) * 100) as bigint)")
        .as("a_p90"))
    val bounds = exactQuantilesByRank(li, "l_returnflag", Seq(
      col("l_quantity") -> Seq(
        "qty_lo" -> 0.49, "qty_mid" -> 0.5, "qty_hi" -> 0.51),
      expr("cast(round(l_extendedprice * 100) as bigint)") -> Seq(
        "p50_lo" -> 0.49, "p50_mid" -> 0.5, "p50_hi" -> 0.51,
        "p90_lo" -> 0.89, "p90_mid" -> 0.9, "p90_hi" -> 0.91)),
      Some(liHistKey(dir)))
    approx.join(bounds, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        round(col("qty_mid"), 2).as("exact_median_qty"),
        col("p50_mid").as("exact_p50_price_cents"),
        col("p90_mid").as("exact_p90_price_cents"),
        col("a_qty").between(col("qty_lo"), col("qty_hi")).as("median_qty_ok"),
        col("a_p50").between(col("p50_lo"), col("p50_hi")).as("p50_price_ok"),
        col("a_p90").between(col("p90_lo"), col("p90_hi")).as("p90_price_ok"))
      .orderBy("l_returnflag")
  }

  /** Set operations: customers in the BUILDING segment vs customers with
    * an urgent order — UNION/INTERSECT/EXCEPT in one labelled result. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val tag = (df: DataFrame, t: String) => df.withColumn("set_op", lit(t))
    tag(building.intersect(urgent), "both")
      .unionByName(tag(building.exceptAll(urgent.intersect(building)), "building_only"))
      .unionByName(tag(urgent.exceptAll(building.intersect(urgent)), "urgent_only"))
      .groupBy("set_op").agg(count(lit(1)).as("n"))
      .orderBy("set_op")
  }

  /** Null-safe equality join (<=>): customers bucketed by a nullable
    * derived key (acctbal sign, null for near-zero balances) matched
    * against a bucket dim that includes the null bucket — null keys MATCH
    * under <=> where a plain join would drop them. */
  def qNullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val bucketDim = Seq((Some("pos"), "in_credit"), (Some("neg"), "in_debt"),
      (Option.empty[String], "flat")).toDF("bal_key", "bucket_name")
    val cust = Tables.customer(spark, dir)
      .withColumn("bal_key",
        when(col("c_acctbal") > 10.0, "pos").when(col("c_acctbal") < -10.0, "neg")
          .otherwise(lit(null)))
    cust.join(broadcast(bucketDim), cust("bal_key") <=> bucketDim("bal_key"))
      .groupBy("bucket_name")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("bucket_name")
  }

  /** CUBE over (returnflag, linestatus): every aggregation lattice cell. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** String-function surface: LIKE pushdown, substring, upper, length.
    * The pattern matches ~1/8 of the synthesized part names ("red bolt",
    * "blue bolt", ...) so the oracle hash verifies real string-function
    * output — a pattern matching zero rows would pass vacuously
    * (EntrySpec's non-vacuity sweep covers this and every other
    * oracle-gated entry). */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%bolt%"))
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"))
      .orderBy("p_partkey")

  /** Date-function surface: extraction, truncation, interval arithmetic,
    * day differences — grouped per order year. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("age_days"))
      .groupBy("order_year")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("order_month")).as("n_months"),
        min("age_days").cast("long").as("min_age_days"),
        max("age_days").cast("long").as("max_age_days"))
      .orderBy("order_year")

  /** Scalar subquery: orders at their customer's personal maximum price.
    * Planned as a single window max over one scan — the aggregate-then-
    * self-join formulation reads and shuffles `orders` twice for the same
    * answer (both sides hash-partition on o_custkey; the window does it
    * once). */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("__max_price", max("o_totalprice").over(w))
      .filter(col("o_totalprice") === col("__max_price"))
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Array-function surface: per priority class, the sorted list of its 3
    * biggest order prices (integer cents) plus array stats. collect_list
    * order is nondeterministic, so sort_array canonicalizes; the list is
    * emitted as a joined string of cents — portable across every result
    * hasher, no cross-engine double/array formatting. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 3)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("bigint"))
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(col("cents"))).as("tp"))
      .select(
        col("o_orderpriority"),
        concat_ws(",", transform(col("tp"), x => x.cast("string"))).as("top_prices_cents"),
        size(col("tp")).cast("long").as("n_top"),
        element_at(col("tp"), -1).as("max_price_cents"))
      .orderBy("o_orderpriority")
  }

  /** Tumbling time-window aggregation over the event stream's batch view. */
  def qTimeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("bucket", "event_type")
}
