package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan (and optionally times execution with
  * EXPLAIN_RUN=1) for any registered query — the tool behind the
  * "explain until it's the plan you'd want" loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (sys.env.get("EXPLAIN_RUN").contains("1")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name executed in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
