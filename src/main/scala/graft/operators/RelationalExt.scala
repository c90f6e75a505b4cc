package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Extended relational surface (SURVEY.md §2.B cont.): the TPC-H query
  * shapes beyond the core set, plus aggregate/window surfaces (grouping
  * sets, selective aggregates, multi-distinct, RANGE frames, rank
  * statistics, gap filling, moment statistics) that a user of the
  * reference's SQL layer would expect from a complete engine.
  *
  * Float-parity convention (see Relational): money lands in the oracle as
  * exact integer cents — `round(x * 100, 0).cast(bigint)` of bit-identical
  * per-row doubles — so sums/ratios hash-match DuckDB exactly regardless
  * of accumulation order; ratios are integer ppm. Double sums appear only
  * rounded to 2 decimals (the established, gate-proven pattern).
  *
  * Scale notes mirror Relational: part/supplier/nation/customer broadcast,
  * fact tables shuffle on their join keys, every filter is scan-pushable.
  */
object RelationalExt {

  /** Exact per-row integer cents of a money double: the product is
    * bit-identical in any IEEE engine, so its decimal rounding is too. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("bigint")

  private def revenue(c: Column = col("l_extendedprice")): Column =
    c * (lit(1.0) - col("l_discount"))

  /** Day number since the corpus epoch — integer, engine-portable. */
  private def dayNum(c: Column): Column = datediff(c, lit("1995-01-01"))

  /** TPC-H Q7-style volume shipping: bidirectional trade volume between
    * two nations by ship year. The nation filters are applied to the
    * supplier/customer DIMENSIONS before the fact joins, so the fact
    * shuffles carry only the ~2/625 of rows that can survive — the
    * difference between this and filter-after-join is the whole query at
    * 100 TB. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    // NATION_3/NATION_8 both have suppliers at every test SF (the sf0.001
    // supplier table has only 10 rows, so most nation pairs are vacuous)
    val nations = Seq("NATION_3", "NATION_8")
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(round(sum(revenue()), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** TPC-H Q8-style market share: NATION_3 suppliers' share of PROMO-part
    * revenue sold to EUROPE customers, per order year. Share is integer
    * ppm of exact cents — `(nation_cents * 1e6) div total_cents` — so the
    * ratio is engine-exact (the bigint product bounds this to corpora
    * under ~9e12 total cents per year; beyond that, widen to decimal). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custEu = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("c_custkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custEu), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev_cents", cents(revenue()))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", col("rev_cents")).otherwise(0L)).as("nation_cents"),
        sum(col("rev_cents")).as("total_cents"))
      .withColumn("share_ppm", expr("nation_cents * 1000000 div total_cents"))
      .orderBy("order_year")
  }

  /** TPC-H Q9-style product profit by supplier nation and year. The
    * testdata has no partsupp table, so supply cost is modeled as a fixed
    * 10% of the part's retail price per unit — the operator shape (6-way
    * join + expression aggregate) is Q9's. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_retailprice")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).as("order_year"))
      // profit in exact integer cents (revenue cents minus cost cents per
      // row): a rounded double SUM of differences lands on .xx5 halfway
      // points often enough to flip against the oracle — integers don't
      .agg(sum(cents(revenue()) -
        cents((lit(0.1) * col("p_retailprice")) * col("l_quantity"))).as("profit_cents"))
      .orderBy("supp_nation", "order_year")
  }

  /** TPC-H Q14-style promo revenue: conditional aggregate over one month,
    * promo share as integer ppm of exact cents. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-02-01"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .withColumn("rev_cents", cents(revenue()))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_cents")).otherwise(0L)).as("promo_cents"),
        sum(col("rev_cents")).as("total_cents"))
      .withColumn("promo_ppm", expr("promo_cents * 1000000 div total_cents"))
  }

  /** TPC-H Q18-style large orders: group the fact table by order, HAVING
    * on the grouped quantity, then join the qualifying keys back to the
    * order/customer dimensions. The quantity sum is exact (integral
    * doubles) so it lands as bigint. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum("l_quantity").cast("bigint").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_cents"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** TPC-H Q19-style disjunctive predicate: an OR of three
    * brand/size/quantity conjuncts across the lineitem⋈part join — the
    * shape that exercises CNF conversion and partial pushdown (each
    * disjunct's part-side predicate prunes the broadcast build side). */
  def q19DisjunctivePred(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(revenue()), 2).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q2-style min-cost supplier: per small part, the supplier with
    * the lowest account balance among those who actually shipped it —
    * the argmin-per-group + join-back shape. Deterministic via min over
    * a (cents, suppkey) struct; the (partkey, suppkey) pairs dedupe
    * BEFORE the dimension join so the shuffle carries keys, not rows. */
  def q2MinAcctSupplier(spark: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val part = Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select("p_partkey", "p_brand", "p_size")
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), cents(col("s_acctbal")).as("acct_cents"))
    shipped
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("p_size"))
      .agg(min(struct(col("acct_cents"), col("s_suppkey"))).as("m"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("m.acct_cents").as("acct_cents"), col("m.s_suppkey").as("s_suppkey"))
      .orderBy("p_partkey")
  }

  /** GROUPING SETS with grouping_id: the explicit-lattice aggregation
    * surface next to rollup/cube — (priority, status), (priority), and
    * grand total in one pass over the Expand operator. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("gid"),
        col("n"), col("total_cents"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Selective-aggregate surface: count_if, bool_and/bool_or, and
    * deterministic max_by/min_by. The ordering key is the exact cents
    * value disambiguated by the (unique) order key — max_by over a
    * non-unique ordering returns an arbitrary peer, which would be a
    * nondeterministic gate. decimal(38,0) carries the composite exactly
    * at any scale factor. */
  def qConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val sortKey = cents(col("o_totalprice")).cast("decimal(38,0)") *
      lit(1000000000000L) + col("o_orderkey")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("count_if(o_totalprice > 200000.0)").as("n_big"),
        max_by(col("o_orderkey"), sortKey).as("biggest_order"),
        min_by(col("o_orderkey"), sortKey).as("smallest_order"),
        bool_or(col("o_orderstatus") === "F").as("any_filled"),
        bool_and(col("o_totalprice") > 0.0).as("all_positive"))
      .orderBy("o_orderpriority")
  }

  /** Multiple DISTINCT aggregates in one pass — the Expand-based
    * multi-distinct rewrite (each distinct column gets its own expansion
    * branch, then a two-level aggregate). */
  def qDistinctAggMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .orderBy("c_mktsegment")

  /** RANGE-frame window: per customer, the rolling 30-day order total —
    * value-based frames (RANGE) against the row-based frames the core
    * window queries use. Peers at the same day all see the same frame, so
    * the result is deterministic without a unique tiebreak. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        dayNum(col("o_orderdate")).as("day"), cents(col("o_totalprice")).as("o_cents"))
      .withColumn("rolling_cents", sum(col("o_cents")).over(w))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .orderBy("o_orderkey")
  }

  /** Rank-statistics window surface: dense_rank / percent_rank /
    * cume_dist per nation over exact balance cents. percent_rank and
    * cume_dist are ratios of identical integers on both engines, so the
    * doubles compare exactly. */
  def qWindowRankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("acct_cents"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("acct_cents"))
      .withColumn("d_rank", dense_rank().over(w).cast("long"))
      .withColumn("p_rank", percent_rank().over(w))
      .withColumn("c_dist", cume_dist().over(w))
      .orderBy("c_custkey")
  }

  /** Time-series gap fill: build the full (segment × day) spine with
    * sequence+explode, left-join the daily revenue, and forward-fill
    * missing days with the last observed value (`last(_, ignoreNulls)`
    * over an unbounded-preceding frame). Days before a segment's first
    * sale stay null — both engines agree by construction. The spine is
    * generated, not collected; at 100 TB the pattern is identical, with
    * the spine still tiny relative to the fact table. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), dayNum(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("day_cents"))
    val spine = daily.select(col("seg")).distinct()
      .crossJoin(broadcast(daily.agg(max(col("day")).as("max_day"))))
      .select(col("seg"), explode(sequence(lit(0), col("max_day"))).as("day"))
    val w = Window.partitionBy(col("seg")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("seg", "day"), "left")
      .withColumn("filled_cents", last(col("day_cents"), ignoreNulls = true).over(w))
      .select(col("seg"), col("day"), col("filled_cents"))
      .orderBy("seg", "day")
  }

  /** Moment statistics per group, hash-exact: n, Σx, Σy, Σxy, Σx², Σy²
    * over integer dollars × day number — every moment is an exact bigint
    * on both engines, unlike corr/stddev doubles whose partition-merge
    * order makes the last ulps nondeterministic. StatsSpec proves Spark's
    * native corr/covar_samp/stddev_samp equal the values these moments
    * derive (within 1e-9), so the native surface is exercised while the
    * gate stays exact. Σx² bounds this to ~1e18 per group (fine through
    * sf10; widen to decimal beyond). */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice"), 0).cast("bigint").as("x"),
        dayNum(col("o_orderdate")).cast("bigint").as("y"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("y") * col("y")).as("sum_yy"))
      .orderBy("o_orderpriority")

  // ---- the remaining TPC-H shapes (q11-q13, q15-q17, q20-q22), adapted
  // to the reduced schema (no partsupp/shipmode/phone — each Scaladoc
  // names the substitution). With these, all 22 TPC-H query shapes are
  // registered and oracle-gated.

  /** TPC-H Q11-style important stock: value concentration per part for
    * one nation's suppliers, kept only where the part's share exceeds a
    * fixed fraction of the nation total (scalar-subquery HAVING). The
    * partsupp value is modeled as shipped `l_quantity * p_retailprice`.
    * The global total is a broadcast scalar — one extra reduction, no
    * second shuffle of the fact. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3").select("s_suppkey")
    val part = Tables.part(spark, dir).select("p_partkey", "p_retailprice")
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("p_retailprice")) * col("l_quantity").cast("bigint"))
        .as("value_cents"))
    // global total as a BROADCAST SCALAR, not an unpartitioned window:
    // the window form funnels every per-part row through one partition
    // (1e8+ rows at catalog scale), while the scalar branch is a
    // two-stage aggregate — only per-partition partial sums move — and
    // ReuseExchange serves both branches from the SAME fact shuffle
    // (plan-asserted in RelationalExtSpec), so the fact is still read
    // and shuffled exactly once
    value
      .crossJoin(broadcast(value.agg(sum(col("value_cents")).as("total_cents"))))
      .filter(col("value_cents") * 1000L > col("total_cents") * 2L) // > 0.2% of total
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** TPC-H Q12-style shipping-delay classes: lines shipped more than 60
    * days after their order date ("late" — the commit/receipt-date pair
    * doesn't exist here), counted by line status and order priority
    * criticality. Conditional CASE aggregate over one fact-fact join. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q13-style customer order-count distribution: LEFT join so
    * zero-order customers survive, per-customer count, then the
    * distribution of those counts. Two shuffles (custkey, then count) —
    * both on low-cardinality keys after the first agg. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then
    * the supplier(s) achieving the global max (scalar subquery against
    * the same derived view — computed once, reused, no re-scan of the
    * fact under AQE reuse). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    // the explicit isNotNull mirrors what the supplier join infers on the
    // main branch — without it the two branches' scan subtrees differ by
    // that one inferred filter and ReuseExchange can't dedupe them
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01")
        && col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(revenue())).as("total_cents"))
    // global max as a broadcast scalar against the same derived view —
    // two-stage agg + ReuseExchange, no single-partition window (see
    // q11ImportantStock)
    rev.crossJoin(broadcast(rev.agg(max(col("total_cents")).as("max_cents"))))
      .filter(col("total_cents") === col("max_cents"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-style supplier counts per part class: distinct suppliers
    * that shipped each (brand, type, size) group, excluding one brand and
    * excluding "complaint" suppliers (negative account balance stands in
    * for the comment-text scan). The part-supplier bridge is the shipped
    * lineitem pairs (no partsupp table), deduplicated BEFORE the
    * dimension join so the distinct-agg input is minimal. */
  def q16PartSupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val bridge = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
    bridge
      .join(Tables.part(spark, dir).filter(col("p_brand") =!= "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand
    * whose quantity is below 20% of that part's average quantity; the
    * per-part average is an aggregate joined back to the fact (the
    * correlated subquery decorrelated by hand). Yearly average revenue
    * in exact cents div 7. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#2").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
    // avg as exact integer: 5 * sum(qty) < n * qty_threshold avoids float
    // division entirely (l_quantity is integral in this corpus)
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_q"),
        count(lit(1)).as("n_q"))
    li.join(avgQ, Seq("l_partkey"))
      .filter(col("l_quantity").cast("bigint") * col("n_q") * 5L < col("sum_q"))
      .agg(sum(cents(col("l_extendedprice"))).as("s"))
      .select(expr("s div 7").cast("bigint").as("avg_yearly_cents"))
  }

  /** TPC-H Q20-style excess inventory: suppliers that shipped more than
    * 60 units of any LARGE-type part in 1997 — the nested
    * exists-chain expressed as semi-joins over a grouped threshold. */
  def q20ExcessInventory(spark: SparkSession, dir: String): DataFrame = {
    val largeParts = Tables.part(spark, dir)
      .filter(col("p_type") === "LARGE").select("p_partkey")
    val qualifying = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(largeParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("bigint").as("shipped_qty"))
      .filter(col("shipped_qty") > 60)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21-style waiting orders: for multi-supplier orders where at
    * least one line is late (shipped >90 days after order), count per
    * supplier the orders where that supplier is the ONLY late one.
    *
    * Shape: ONE pass over the fact⋈fact join, reduced immediately to
    * (order, supplier, any-late) granularity by a grouped agg, then the
    * exists/not-exists pair as counts-over-window on the order key — the
    * qualifying rows ARE the answer pairs, so there is no join back to
    * the fact (the earlier semi-probe re-evaluated the whole fact join in
    * a second branch, and its build side outgrew the broadcast threshold
    * at 3x — caught by ScalingBench, 6x cliff). Per-order window state is
    * a handful of supplier rows at any scale. */
  def q21WaitingOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late", datediff(col("l_shipdate"), col("o_orderdate")) > 90)
    val w = Window.partitionBy("l_orderkey")
    li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("is_late"), 1).otherwise(0)).as("late"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum(col("late")).over(w))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1 && col("late") === 1)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q22-style sales opportunity: customers with above-average
    * positive balance and NO urgent order (market segment stands in for
    * the phone country code). Anti-join + broadcast scalar threshold —
    * the fact is touched once, filtered to urgent keys only. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("acct_cents"))
    val avgBal = cust.filter(col("acct_cents") > 0)
      // exact integer threshold: custkey * avg < sum  ==  custkey < avg
      .agg(sum(col("acct_cents")).as("sum_pos"), count(lit(1)).as("n_pos"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    cust
      .join(broadcast(avgBal))
      .filter(col("acct_cents") * col("n_pos") > col("sum_pos")) // bal > avg(positive)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), sum(col("acct_cents")).as("totacct_cents"))
      .orderBy("c_mktsegment")
  }

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`) — hierarchy walking, the
    * SQL surface a Postgres user reaches for on org charts / BOMs /
    * category trees. The synthetic hierarchy is the binary tree
    * `parent(k) = k DIV 2` over supplier keys; each supplier's depth and
    * ancestor-key sum require the full iterative walk (no closed form in
    * the plan), so the oracle (DuckDB's own recursive CTE) gates every
    * step of the recursion. Each iteration is a distributed self-join on
    * the previous frontier — the same per-round shape as
    * [[graft.dedup.DedupOps.dedupClusters]], planned by the engine. */
  def qRecursiveChain(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.sqlCatalog(spark, dir)
    spark.sql(
      """WITH RECURSIVE walk AS (
        |  SELECT s_suppkey AS node, s_suppkey AS anc, CAST(0 AS BIGINT) AS steps FROM supplier
        |  UNION ALL
        |  SELECT node, anc DIV 2, steps + 1 FROM walk WHERE anc > 1
        |)
        |SELECT node AS s_suppkey, CAST(max(steps) + 1 AS BIGINT) AS depth,
        |  CAST(sum(anc) AS BIGINT) AS path_sum
        |FROM walk GROUP BY node ORDER BY node""".stripMargin)
  }

  /** Correlated LATERAL subquery — per-outer-row top-k, the "for each
    * group, its best N" SQL shape (Postgres users write this instead of
    * a rank window). Catalyst decorrelates the LIMITed inner query into
    * a per-group rank plan, so the declarative form pays no
    * nested-loop. */
  def qLateralTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.sqlCatalog(spark, dir)
    spark.sql(
      """SELECT n.n_name, t.c_custkey, t.acct_cents
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents
        |  FROM customer WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) t
        |ORDER BY n.n_name, t.acct_cents DESC, t.c_custkey""".stripMargin)
  }

  /** Ordered string aggregation — Spark 4's `listagg(col, sep) WITHIN
    * GROUP (ORDER BY ...)`, the report-building shape Postgres serves
    * with `string_agg`. Deterministic by the explicit within-group
    * order, so the concatenated string is hash-portable. */
  def qListagg(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.sqlCatalog(spark, dir)
    spark.sql(
      """SELECT r_name,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  /** UNPIVOT — wide→long reshaping of an aggregate (the inverse of
    * [[graft.operators.Relational.qPivot]]): per-flag metric columns melt
    * into (flag, metric, val) rows, all-integer for the exact gate. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.sqlCatalog(spark, dir)
    spark.sql(
      """SELECT * FROM (
        |  SELECT l_returnflag,
        |    CAST(sum(l_quantity) AS BIGINT) AS qty,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_cents
        |  FROM lineitem GROUP BY l_returnflag
        |) UNPIVOT (val FOR metric IN (qty, price_cents))
        |ORDER BY l_returnflag, metric""".stripMargin)
  }

  /** Distinct counting through MERGEABLE HLL sketches (Apache DataSketches
    * via Spark's native `hll_sketch_agg`/`hll_union_agg`) — the 100 TB
    * distinct-count pattern: per-shard sketches are tiny (2^lgK bytes),
    * map-side combinable, STORABLE, and the rollup row is a sketch UNION,
    * never a rescan. Here each order-priority group builds its own sketch
    * of customer ids in one pass and the ALL row merges those five
    * sketches — at fleet scale the groups are daily shards and the union
    * answers "distinct customers ever" from kilobytes.
    *
    * Gate shape follows `text_heavy_hitters` (CMS): the exact distinct
    * counts are hash-gated, and the sketch path is contract-gated by an
    * in-plan boolean — estimate within ±5% of exact (lgK=14 over ≤ ~25k
    * distinct keys estimates far inside that; the bound trips on any
    * sketch/union regression). The exact countDistinct is the GATE's
    * cost, not the pattern's — production serves from the sketches. */
  def qHllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val per = orders
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"),
        hll_sketch_agg(col("o_custkey"), 14).as("__sk"))
    val all = per
      .agg(hll_union_agg(col("__sk")).as("__sk"))
      .crossJoin(broadcast(
        orders.agg(countDistinct(col("o_custkey")).as("n_exact"))))
      .select(lit("ALL").as("grp"), col("n_exact"), col("__sk"))
    per.unionByName(all)
      .select(col("grp"), col("n_exact"),
        (abs(hll_sketch_estimate(col("__sk")) - col("n_exact"))
          <= col("n_exact") * 0.05).as("est_ok"))
      .orderBy("grp")
  }

  /** 2-D Pareto frontier (skyline) over part: minimize price, maximize
    * size — the multi-criteria "best offers" query (SKYLINE OF in other
    * engines; the classic Börzsönyi et al. ICDE'01 operator). A row is on
    * the skyline iff no other row is ≤ its price AND ≥ its size with at
    * least one strict. Exact integer dims (price as cents) so the gate
    * replays every comparison.
    *
    * Scale shape — NEVER the naive O(n²) dominance self-join the oracle
    * states: for 2-D, a point survives iff its size beats the max size
    * among all STRICTLY cheaper points, so the skyline is a running-max
    * scan. (1) collapse same-price groups to their max size (one
    * map-side-combined groupBy — same-price domination); (2) running max
    * over the per-price frame as a DISTRIBUTED prefix max (the
    * `text_pack_sequences` / `stream_late_data` pattern: per-bucket
    * maxes, a ≤nBuckets cross-bucket window, parallel in-bucket windows
    * — no global single-partition window at any corpus size); (3) the
    * surviving (price, size) frontier is tiny by construction (expected
    * O(log n) on random data), so the join back to recover ties/row ids
    * broadcasts. One scan, one groupBy shuffle, one bounded scalar. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(spark, dir).select(
      col("p_partkey"),
      cents(col("p_retailprice")).as("price_cents"),
      col("p_size").cast("long").as("p_size"))
    val perPrice = pts.groupBy("price_cents").agg(max("p_size").as("max_size"))
    // bounded scalar metadata (the lateDataAccounting precedent): bucket
    // width for the range partitioning of the prefix max
    val maxPriceRow = pts.agg(max("price_cents")).head()
    val maxPrice = if (maxPriceRow.isNullAt(0)) 0L else maxPriceRow.getLong(0)
    val width = maxPrice / 32 + 1
    val bucketed = perPrice.withColumn("bucket", expr(s"price_cents div $width"))
    val wPrev = Window.orderBy("bucket").rowsBetween(Long.MinValue, -1)
    val prefix = bucketed.groupBy("bucket").agg(max("max_size").as("bmax"))
      .withColumn("prev_max", max("bmax").over(wPrev))
      .select("bucket", "prev_max")
    // in-bucket rows are DISTINCT prices, so the strict-predecessor row
    // frame is exactly the strictly-cheaper set
    val wIn = Window.partitionBy("bucket").orderBy("price_cents")
      .rowsBetween(Long.MinValue, -1)
    val frontier = bucketed.join(broadcast(prefix), "bucket")
      .withColumn("cheaper_max", greatest(
        coalesce(max("max_size").over(wIn), lit(Long.MinValue)),
        coalesce(col("prev_max"), lit(Long.MinValue))))
      .where(col("max_size") > col("cheaper_max"))
      // fresh names: frontier derives from pts, so a same-name join-back
      // would be an ambiguous self-join
      .select(col("price_cents").as("f_price"), col("max_size").as("f_size"))
    pts.join(broadcast(frontier),
        col("price_cents") === col("f_price") && col("p_size") === col("f_size"))
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
      .orderBy("price_cents", "p_partkey")
  }

  /** One-pass column profiling over orders — the ANALYZE/data-quality
    * sweep every ingestion pipeline runs before trusting a drop: per
    * column row count, null count, exact distinct count, min and max in
    * a canonical string form (money profiled as exact cents). All six
    * stats for all five columns come from ONE scan: a single aggregate
    * row (multi-distinct via Catalyst's Expand rewrite — the
    * `q_distinct_agg_multi` machinery), exploded into the per-column
    * report frame by a 5-element inline table that never touches data.
    *
    * At fleet scale the exact ndv column is the knowingly-priced part
    * (Expand replicates scan rows per distinct-agg); the sketch swap is
    * [[qHllDistinct]]'s `hll_sketch_agg` per column — same plan shape,
    * kilobyte state. min/max/null counts stay exact and map-side. */
  def qProfileColumns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("total_cents", cents(col("o_totalprice")))
    def stats(c: String): Seq[Column] = Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_ndv"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "total_cents")
    val aggRow = o.agg(count(lit(1)).as("n_rows"),
      cols.flatMap(stats): _*)
    aggRow.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          (col("n_rows") - col(s"${c}_nn")).as("n_null"),
          col(s"${c}_ndv").as("n_distinct"),
          col(s"${c}_min").as("min_str"),
          col(s"${c}_max").as("max_str"))): _*)).as("s"))
      .select(col("s.col_name"), col("n_rows"), col("s.n_null"),
        col("s.n_distinct"), col("s.min_str"), col("s.max_str"))
      .orderBy("col_name")
  }

  /** Incremental aggregate maintenance (the materialized-view refresh /
    * Delta-MERGE-into-summary shape): a per-customer order summary is
    * maintained as ALGEBRAIC partials — count, sum, min, max — computed
    * separately over a base slice (orders before 1998) and a delta slice
    * (the rest), then merged by re-aggregating the partials: counts and
    * sums add, mins and maxes fold. The oracle recomputes the summary
    * from the FULL table directly, so the gate proves the decomposition
    * law the whole pattern rests on (merge(partial(A), partial(B)) =
    * agg(A ∪ B)) — the same law behind Spark's own partial aggregation,
    * stated here at the table-maintenance level.
    *
    * Scale shape: at lake scale the base partials are a PERSISTED
    * summary table that is never rescanned — each refresh pays one scan
    * of the delta plus a partials-sized merge shuffle (both sides
    * already keyed by o_custkey; at 100 TB the summary is bucketed on
    * the key, making the merge exchange-free). The demo computes the
    * base partials in-plan because the gate needs the full pipeline in
    * one query; only the date filter separates the two scans. */
  def qIncrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("total_cents"))
    def partials(df: DataFrame): DataFrame = df.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"), sum("total_cents").as("sum_cents"),
      min("total_cents").as("min_cents"), max("total_cents").as("max_cents"))
    val base = partials(o.filter(col("o_orderdate") < lit("1998-01-01")))
    val delta = partials(o.filter(col("o_orderdate") >= lit("1998-01-01")))
    base.unionByName(delta)
      .groupBy("o_custkey")
      .agg(sum("n_orders").cast("long").as("n_orders"),
        sum("sum_cents").cast("long").as("sum_cents"),
        min("min_cents").cast("long").as("min_cents"),
        max("max_cents").cast("long").as("max_cents"))
      .orderBy("o_custkey")
  }
}
