package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic main (not registered anywhere): batch scan audit
  * for guide §6 — for each named query, print every parquet scan's
  * ReadSchema and PushedFilters from the formatted plan, so column-
  * pruning and predicate-pushdown misses across the suite are visible
  * without one sbt launch per query.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <query[,query...]> [outDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val outDir = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        outDir.foreach { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name.txt"), plan)
        }
        println(s"## $name")
        // the details section lists one "(n) Scan parquet" block per scan
        // with Location / PushedFilters / ReadSchema lines
        val lines = plan.linesIterator.toSeq
        lines.zipWithIndex.foreach { case (l, i) =>
          val t = l.trim
          if (t.matches("\\(\\d+\\) Scan parquet.*") ||
              t.startsWith("Location:") || t.startsWith("PushedFilters:") ||
              t.startsWith("ReadSchema:"))
            println("  " + t.take(240))
        }
      } catch {
        case e: Exception =>
          println(s"## $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
