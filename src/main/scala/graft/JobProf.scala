package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic main (not registered anywhere): per-invocation
  * Spark JOB chain for named queries — job count, per-job wall time,
  * task count and summed task time, keyed by callsite. The §2.4/§1.2
  * "fewer barriers" work needs exactly this view: at sf0.1 many entries
  * are barrier/commit-bound (8 cores beat 32), so the lever is the
  * number of sequential jobs, not the per-task work.
  *
  * Usage: runMain graft.JobProf <sfDir> <query[,query...]> [reps]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "4m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, var desc: String = "", var t0: Long = 0,
      var t1: Long = 0, var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId)
        j.t0 = e.time
        j.nStages = e.stageInfos.size
        j.nTasks = e.stageInfos.map(_.numTasks).sum
        def prop(k: String) =
          Option(e.properties).flatMap(p => Option(p.getProperty(k)))
        // group by SQL execution id: every broadcast-build future job
        // carries its parent ACTION's execution id, which is the unit the
        // fewer-barriers work counts (one action == one driver barrier)
        val exec = prop("spark.sql.execution.root.id")
          .orElse(prop("spark.sql.execution.id")).getOrElse("-")
        val site = prop("callSite.short")
          .filterNot(_.contains("CompletableFuture"))
          .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("?")
        j.desc = f"ex=$exec%-4s $site"
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to reps) {
        jobs.clear()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // let listener events drain (listenerBus is spark-private)
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.id)
        println(f"== $name rep $r: wall=$wall%.2f s, jobs=${js.size}")
        js.foreach { j =>
          val d = (j.t1 - j.t0) / 1000.0
          println(f"   job ${j.id}%3d  $d%7.3f s  st=${j.nStages}%2d tk=${j.nTasks}%4d  ${j.desc.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
