package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Contracts the DuckDB oracle can't express: sketch accuracy, degenerate
  * inputs, and physical-plan shape (pushdown / broadcast). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("approx_count_distinct bound booleans hold and exacts match a direct count") {
    val rows = Relational.qApproxDistinct(spark, SfDir)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (status, p, o, pOk, oOk) =>
      assert(pOk && oOk, s"$status estimate out of 5% bound")
      assert(p > 0 && o > 0)
    }
    val exact = Tables.lineitem(spark, SfDir)
      .groupBy("l_linestatus")
      .agg(countDistinct("l_partkey").as("p"), countDistinct("l_orderkey").as("o"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (status, p, o, _, _) =>
      assert(exact(status) == ((p, o)), s"$status exact columns drifted")
    }
  }

  test("approx_percentile bound booleans hold and exacts match percentile()") {
    val rows = Relational.qApproxPercentiles(spark, SfDir)
      .as[(String, Double, Double, Double, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, _, _, _, a, b, c) =>
      assert(a && b && c, s"$flag sketch out of its p±0.01 bound")
    }
    val exact = Tables.lineitem(spark, SfDir)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_quantity, 0.5)"), 2).as("m"),
        expr("percentile(cast(round(l_extendedprice * 100) as bigint), 0.5)").as("p50"),
        expr("percentile(cast(round(l_extendedprice * 100) as bigint), 0.9)").as("p90"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.foreach { case (flag, m, p50, p90, _, _, _) =>
      assert(exact(flag) == ((m, p50, p90)), s"$flag exact quantiles drifted")
    }
  }

  test("rank-based exact percentiles match percentile() bit-for-bit, no buffer agg") {
    val out = Relational.qPercentiles(spark, SfDir)
    // no whole-group Percentile buffer anywhere in the plan: the rank
    // rewrite must keep the scale-killer ObjectHashAggregate out
    val plan = planOf(out)
    assert(!plan.toLowerCase.contains("percentile"),
      s"plan still contains a percentile buffer aggregate:\n$plan")
    val got = out.as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val want = Tables.lineitem(spark, SfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 2).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 2).as("p90_qty"),
        expr("percentile(cast(round(l_extendedprice * 100) as bigint), 0.5)")
          .as("median_price_cents"))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq, s"rank-based != percentile():\n${got.toSeq}\n${want.toSeq}")
  }

  test("histogram-refined quantiles survive degenerate and skewed value distributions") {
    // worst cases for bucket refinement: a group where EVERY value is
    // identical (one bucket holds the whole group), a two-value group
    // straddling an interpolation midpoint, and a heavy-tailed group —
    // all must match percentile() bit-for-bit
    val df = spark.range(200000).select(
      when(col("id") % 3 === 0, "allsame")
        .when(col("id") % 3 === 1, "twoval").otherwise("tail").as("g"),
      when(col("id") % 3 === 0, lit(7.0))
        .when(col("id") % 3 === 1, (col("id") % 2).cast("double"))
        .otherwise(pow(lit(1.1), col("id") % 200).cast("double")).as("v"))
    val got = Relational.exactQuantilesByRank(df, "g",
      Seq(col("v") -> Seq("p50" -> 0.5, "p90" -> 0.9, "p01" -> 0.01)))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val want = df.groupBy(col("g")).agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.01)").as("p01"))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq, s"\n$got\n$want")
  }

  test("rank quantiles survive adjacent-double (ulp-level) value spacing") {
    // The bucket map floor(signum(v)·ln(|v|+1)·512) documents a contract:
    // value spacing ≫ 1 ulp of ln. Probe the contract's edge directly —
    // runs of CONSECUTIVE doubles (nextUp chains) at several magnitudes
    // and signs, plus chains straddling exact bucket boundaries
    // v = e^(k/512) − 1 where floor() flips. The kernel must either still
    // match percentile() bit-for-bit (ln stayed monotone over adjacent
    // doubles) or die through its raise_error covering-bucket fallback;
    // a silent wrong quantile fails this assert.
    def chain(start: Double, n: Int): Seq[Double] =
      Iterator.iterate(start)(Math.nextUp).take(n).toSeq
    val bucketEdges = Seq(100, 3000, 7000, -2000).map(k => math.exp(k / 512.0) - 1.0)
    val groups: Seq[(String, Seq[Double])] =
      (Seq(1.0, 1e6, 1e12, -1.0, -1e9, 0.0).map(b => s"mag_$b" -> chain(b, 400)) ++
        bucketEdges.map(e => s"edge_$e" -> chain(Math.nextDown(Math.nextDown(e)), 400)))
    val rows = groups.flatMap { case (g, vs) => vs.map(g -> _) }
    val df = rows.toDF("g", "v")
    val got = Relational.exactQuantilesByRank(df, "g",
      Seq(col("v") -> Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val want = df.groupBy(col("g")).agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.99)").as("p99"))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      s"adjacent-double quantiles drifted silently:\n${got.toSeq}\n${want.toSeq}")
  }

  test("anti join isolates synthesized orphan customers") {
    val cust = Tables.customer(spark, SfDir)
    val orphans = cust.limit(7).withColumn("c_custkey", col("c_custkey") + 1000000L)
    val all = cust.unionByName(orphans)
    val out = all.join(Tables.orders(spark, SfDir),
      col("c_custkey") === col("o_custkey"), "left_anti")
    // every natural customer has orders in the testdata, so exactly the
    // planted orphans survive
    assert(out.filter(col("c_custkey") >= 1000000L).count() == 7)
    assert(out.count() == 7 + Relational.qAntiJoin(spark, SfDir).count())
  }

  test("event-time skew diagnostics report consistent integer facts") {
    val r = graft.operators.JoinOps.qTimeSkewDiagnose(spark, SfDir).head()
    val nBuckets = r.getAs[Long]("n_buckets")
    val nRows = r.getAs[Long]("n_rows")
    val maxCnt = r.getAs[Long]("max_cnt")
    assert(nBuckets > 0 && maxCnt > 0 && nRows >= maxCnt)
    // the facts must be mutually consistent with their definitions
    assert(r.getAs[Long]("skew_ppm") == maxCnt * nBuckets * 1000000L / nRows)
    assert(r.getAs[Long]("top_share_ppm") == maxCnt * 1000000L / nRows)
    // n_rows is the full event count — no bucket drops rows
    assert(nRows == Tables.events(spark, SfDir).count())
    val top = r.getAs[String]("top_buckets").split(",")
    assert(top.nonEmpty && top.length <= 3 && top.distinct.length == top.length)
    // the reported hottest hour really is the max-count bucket
    val perBucket = Tables.events(spark, SfDir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket")).count()
      .orderBy(col("count").desc, col("bucket"))
      .select(col("bucket").cast("string")).as[String].head()
    assert(top.head == perBucket)
  }

  test("row salt spreads a single hot key across all salt values") {
    val hot = Seq.fill(1000)(42L).toDF("k")
    val saltCounts = hot.withColumn("s", graft.operators.JoinOps.rowSalt(8))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(saltCounts.keySet == (0 until 8).toSet,
      s"hot key landed on salts ${saltCounts.keySet} only")
    // and the salted join still returns exactly the plain-join rows
    val small = Seq((42L, "x")).toDF("sk", "v")
    val joined = graft.operators.JoinOps.saltedJoin(hot, small, "k", "sk", 8)
    assert(joined.count() == 1000)
  }

  test("AQE skew-join split fires on a planted skewed key distribution") {
    // closes the q_skew_diagnose -> strategy-choice story with a PLAN
    // contract: when diagnostics say "skewed", the AQE path must actually
    // split the skewed partition at runtime (VERDICT r6 ask #5)
    val overrides = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512KB",
      // force sort-merge: both static and AQE runtime broadcast off
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key owns 250k of 300k padded rows -> its shuffle
      // partition is ~40 MB vs ~2 MB median under 4 shuffle partitions
      // pad must be row-dependent AND incompressible: a literal pad
      // constant-folds out of the shuffle entirely, and a repetitive one
      // lz4-compresses below the skew threshold (skew detection reads
      // COMPRESSED map-output sizes) — hashes do neither
      val big = spark.range(300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id") % 64).as("k"),
        col("id").as("v"),
        repeat(sha2(col("id").cast("string"), 256), 4).as("pad"))
      val dim = spark.range(64).select(col("id").as("k"), col("id").as("w"))
      // global partial aggregate: requires no output distribution, so
      // OptimizeSkewedJoin is free to split (an agg keyed on k would
      // suppress the split to preserve partitioning)
      val out = big.join(dim, "k").agg(sum(length(col("pad"))).as("bytes"))
      assert(out.collect().head.getLong(0) == 300000L * 256)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.linesIterator.take(40).mkString("\n")}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, SfDir))
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), s"no pushdown:\n$plan")
    // projection pruning: only the 7 referenced columns are read
    assert(plan.contains("l_returnflag") && !plan.contains("l_comment"),
      "scan reads unused columns")
  }

  test("q5 snowflake joins broadcast every dimension") {
    val plan = planOf(Relational.q5LocalSupplier(spark, SfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
  }

  test("whole-stage codegen covers the q1 aggregation") {
    // AQE only materializes codegen spans in the executed plan
    val df = Relational.q1PricingSummary(spark, SfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(N)" prefixes mark WholeStageCodegen spans in the compact plan form
    assert(plan.contains("*(1)"), s"q1 fell out of codegen:\n$plan")
    assert(plan.contains("*(1) HashAggregate"), "partial aggregate not fused with the scan stage")
  }
}
