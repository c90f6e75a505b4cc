package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuning rationale (100 TB / multi-executor design, exercised on local[N]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
  *    so plans written here survive scale-up without manual re-tuning.
  *  - shuffle.partitions sized to the local core count (the driver contract
  *    passes SPARK_GRAFT_CPUS); on a real cluster this would be ~2-3x total
  *    cores and AQE coalesces down.
  *  - UTC session timezone: oracle (DuckDB) parity for all temporal ops.
  */
object GraftSession {
  def apply(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // cosine_sim etc. in SQL
    spark
  }

  /** Apply graft's standard configs to an externally-built session (the
    * driver owns the session in Verify/Bench; tests own their own). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Register every star-schema table at `dir` (plus the ingested cards /
    * sets corpora) as temp views, so the reference's raw-SQL workflow
    * (`psql`-style ad-hoc queries) works verbatim through `spark.sql`:
    *
    * {{{
    * GraftSession.sqlCatalog(spark, dataDir)
    * spark.sql("SELECT s.name, count(*) FROM cards c JOIN sets s ON ... GROUP BY 1")
    * }}}
    *
    * Views are lazy metadata over the parquet scans — registration costs
    * nothing until queried, and every view gets full pushdown/pruning. */
  def sqlCatalog(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    graft.ingest.IngestOps.cardsCorpus(spark).createOrReplaceTempView("cards")
    graft.ingest.IngestOps.setsCorpus(spark).createOrReplaceTempView("sets")
  }
}
