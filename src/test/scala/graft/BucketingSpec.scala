package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located joins must plan without a shuffle on either side —
  * the layout-level optimization fact⋈fact joins rely on at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("partitioned layout prunes directories on partition-column filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/orders"
    Bucketing.writePartitioned(
      Tables.orders(spark, SfDir)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM")),
      dir, "order_month")
    val pruned = spark.read.parquet(dir).filter(col("order_month") === "1997-03")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("order_month"),
      s"no partition pruning:\n$plan")
    // and the pruned read returns exactly the month's rows
    val expected = Tables.orders(spark, SfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-03").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("q_partition_prune reads ONLY the month's directory, losslessly") {
    val out = Bucketing.qPartitionPrune(spark, SfDir)
    val rows = out.collect()
    val expected = Tables.orders(spark, SfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1996-03").count()
    assert(rows.length == expected && expected > 0, "pruned read lost/gained rows")
    // quantitative: the scan's file count equals the files physically in
    // the one matching partition directory — pruning by LISTING, not by
    // reading-and-filtering
    def parquets(d: java.io.File): Int =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .count(_.getName.endsWith(".parquet"))
    val root = new java.io.File(Bucketing.partitionedOrdersPath(spark, SfDir))
    val monthFiles = parquets(new java.io.File(root, "order_month=1996-03"))
    val allFiles = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).map(parquets).sum
    // descend through AQE stage boundaries (QueryStageExec is a leaf to
    // collect(), so a plain collect sees zero scans under AQE)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s.metrics("numFiles").value)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(out.queryExecution.executedPlan).sum
    assert(scanned == monthFiles && monthFiles < allFiles,
      s"scanned $scanned files; month dir has $monthFiles of $allFiles total")
  }

  test("join of two tables bucketed on the key has no Exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey", "o_totalprice")
          .withColumnRenamed("o_orderkey", "k"),
        "b_orders", "k", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, SfDir).select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "k"),
        "b_lineitem", "k", 8)
      val joined = Bucketing.cocolocatedJoin(spark, "b_orders", "b_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same result as the plain join
      val expected = Tables.orders(spark, SfDir)
        .join(Tables.lineitem(spark, SfDir),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q_bucketed_join entry: zero Exchange and zero Sort below the sort-merge join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = Bucketing.qBucketedJoin(spark, SfDir)
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val smjs = walk(df.queryExecution.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, "bucketed join did not plan as sort-merge")
    val below = smjs.flatMap(j => j.children.flatMap(walk))
    assert(below.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "bucketed join still shuffles a side")
    // any residual Sort must be bucket-LOCAL (no exchange under it):
    // Spark only trusts sortBy ordering behind the legacy
    // bucketedTableScan.outputOrdering flag, so a per-bucket sort is
    // expected — the priced win is the eliminated shuffle
    val sorts = below.collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.forall(!_.global), "bucketed join introduced a GLOBAL sort")
    // and the layout serves the CORRECT join: counts match the raw join
    val n = df.agg(sum("n_lines")).head().getLong(0)
    val raw = Tables.orders(spark, SfDir).join(
      Tables.lineitem(spark, SfDir), col("o_orderkey") === col("l_orderkey")).count()
    assert(n == raw, s"bucketed join produced $n of $raw lines")
  }

  test("compaction rewrites a small-file directory to the sized file count") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = Tables.documents(spark, SfDir)
    docs.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    def files(d: String) = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".parquet"))
    val smallFiles = files(s"$base/small")
    assert(smallFiles.length == 64, s"setup wrote ${smallFiles.length} files")
    val totalBytes = smallFiles.map(_.length).sum
    val n = Bucketing.compact(spark, s"$base/small", s"$base/compacted", totalBytes / 4)
    val out = files(s"$base/compacted")
    assert(out.length == n, s"wrote ${out.length} files, planned $n")
    assert(n >= 2 && n <= 8, s"sizing picked $n files for a /4 target")
    assert(spark.read.parquet(s"$base/compacted").count() == docs.count())
  }

  test("zValue interleaves bits correctly and orders by Morton curve") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Bucketing.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // interleave: z(a,b) with a on even bits, b on odd: (1,0)->1, (0,1)->2,
    // (1,1)->3, (2,2)->12, (65535,65535)->2^32-1
    assert(out == Seq(0L, 1L, 2L, 3L, 12L, 4294967295L), s"got $out")
  }

  test("z-ordered files carry narrow min/max envelopes on both dimensions") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // two independent dims PRE-SCALED to the same bit width (the zValue
    // contract: equal widths, or the range split degenerates to the wider
    // dimension's top bits and the narrower one gets no locality)
    val src = Tables.orders(spark, SfDir).select(
      col("o_orderkey"),
      (col("o_custkey") % 256L).as("cust_b"),
      (col("o_totalprice").cast("long") % 256L).as("price_b"))
    src.repartition(32).write.mode("overwrite").parquet(s"$base/roundrobin")
    Bucketing.writeZOrdered(src, s"$base/zorder", col("cust_b"), col("price_b"), 32, bits = 8)
    def spanSum(dir: String, c: String): Long =
      Option(new java.io.File(dir).listFiles()).get
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath).agg(min(col(c)), max(col(c))).head()
          r.getLong(1) - r.getLong(0)
        }.sum
    // same file count, same rows — but each z-file owns a compact range of
    // BOTH dimensions, where round-robin files all span the whole domain
    assert(spark.read.parquet(s"$base/zorder").count() ==
      spark.read.parquet(s"$base/roundrobin").count())
    val (zc, rc) = (spanSum(s"$base/zorder", "cust_b"), spanSum(s"$base/roundrobin", "cust_b"))
    val (zp, rp) = (spanSum(s"$base/zorder", "price_b"), spanSum(s"$base/roundrobin", "price_b"))
    assert(zc * 2 < rc, s"cust envelopes not clustered: z=$zc rr=$rc")
    assert(zp * 2 < rp, s"price envelopes not clustered: z=$zp rr=$rp")
  }

  test("q_zorder_prune: lossless vs the raw table AND most files skippable") {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    // result contract: identical ROW SET to the same box over the raw
    // table ((l_orderkey, l_linenumber) is not unique in the synthetic
    // data, so compare fully sorted, exactly as the driver gate does)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val got = Bucketing.qZorderPrune(spark, SfDir).collect().toSeq.map(key).sorted
    val want = Tables.lineitem(spark, SfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      .filter(col("l_partkey").between(20, 120) && col("l_suppkey").between(2, 8))
      .collect().toSeq.map(key).sorted
    assert(got.nonEmpty && got == want)
    // pruning contract: a box sized ~10% x 20% of the ACTUAL key domain
    // must be servable from a minority of files via their [min,max]
    // envelopes — that is the entire point of the Z layout (parquet
    // row-group skipping uses exactly these stats). Domain-relative
    // bounds keep the assertion meaningful at every SF.
    val dir = new java.io.File(Bucketing.zorderedLineitemPath(spark, SfDir))
    val files = Option(dir.listFiles()).get.filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected a multi-file layout, got ${files.length}")
    val dom = Tables.lineitem(spark, SfDir)
      .agg(fmax(col("l_partkey")), fmax(col("l_suppkey"))).head()
    val (pLo, pHi) = (dom.getLong(0) / 10, dom.getLong(0) / 5)
    val (sLo, sHi) = (dom.getLong(1) / 10, dom.getLong(1) * 3 / 10)
    val reachable = files.count { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(fmin(col("l_partkey")), fmax(col("l_partkey")),
          fmin(col("l_suppkey")), fmax(col("l_suppkey"))).head()
      r.getLong(0) <= pHi && r.getLong(1) >= pLo && r.getLong(2) <= sHi && r.getLong(3) >= sLo
    }
    assert(reachable * 2 <= files.length,
      s"box [$pLo,$pHi]x[$sLo,$sHi] reaches $reachable of ${files.length} files — layout not pruning")
  }

  test("q_zorder3_prune: lossless 3-D box and per-dim envelopes clustered") {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val got = Bucketing.qZorder3Prune(spark, SfDir).collect().toSeq.map(key).sorted
    val want = Tables.lineitem(spark, SfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      .filter(col("l_partkey").between(20, 120) && col("l_suppkey").between(2, 8)
        && col("l_quantity").between(10, 30))
      .collect().toSeq.map(key).sorted
    assert(got.nonEmpty && got == want)
    // every dimension's summed per-file envelope must be a strict subset
    // of the whole domain times the file count — i.e. the 3-way
    // interleave clusters ALL THREE dims, not just the leading one
    val dir = new java.io.File(Bucketing.zordered3LineitemPath(spark, SfDir))
    val files = Option(dir.listFiles()).get.filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8)
    for (c <- Seq("l_partkey", "l_suppkey")) {
      val dom = Tables.lineitem(spark, SfDir)
        .agg(fmax(col(c)) - fmin(col(c))).head().getLong(0)
      val spanSum = files.map { f =>
        val r = spark.read.parquet(f.getPath).agg(fmin(col(c)), fmax(col(c))).head()
        r.getLong(1) - r.getLong(0)
      }.sum
      assert(spanSum * 3 < dom * files.length * 2,
        s"$c envelopes not clustered: spanSum $spanSum vs domain $dom x ${files.length}")
    }
  }
}
