package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic main (not registered anywhere): candidate-stream
  * and verify-input sizes for the containment miner at two dirs. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val t0 = System.nanoTime()
      val stats = graft.dedup.DedupOps.containmentDiag(spark, dir)
      println(f"[diag] $dir: $stats wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
