package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.WindowOps
import graft.streaming.EventStreams

/** Structured Streaming paths (SURVEY.md §2.F): the registered batch
  * queries and the real readStream/writeStream pipelines must agree. */
class EventStreamSpec extends SparkSpec {

  test("streaming windowed counts equal the batch plan on a completed input") {
    // watermarks require TIMESTAMP (not NTZ) event time
    val events = Tables.events(spark, SfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = Files.createTempDirectory("graft_stream_in").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.windowCountsStreaming(stream)
      .writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)

    // append mode only emits windows closed by the watermark; every emitted
    // row must match the batch result exactly
    val batch = EventStreams.windowCounts(events)
    val streamed = spark.table("win_counts")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("watermarked streaming dedup removes duplicate event ids") {
    val events = Tables.events(spark, SfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft_dedup_in").toString
    // two identical files → every event arrives twice
    events.write.mode("overwrite").parquet(dir + "/a")
    events.write.mode("overwrite").parquet(dir + "/b")
    val schema = spark.read.parquet(dir + "/a").schema
    val stream = spark.readStream.schema(schema).parquet(dir + "/{a,b}")
    val q = stream
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val n = spark.table("dedup_out").count()
    assert(n == events.count(), s"deduped stream has $n rows")
    assert(spark.table("dedup_out").select("event_id").distinct().count() == n)
  }

  test("streaming upsert sink converges to batch last-write-wins per key") {
    import graft.operators.MergeOps
    val events = Tables.events(spark, SfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val in = Files.createTempDirectory("graft_upsert_in").toString
    events.write.mode("overwrite").parquet(in)
    val target = Files.createTempDirectory("graft_upsert_out").toString + "/state"
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = EventStreams.upsertSink(stream, target, ckpt,
      Seq("user_id"), "ts", "event_id")
    try q.processAllAvailable() finally q.stop()

    val streamedState = spark.read.parquet(target)
    val batchState = MergeOps.latestByKey(events, Seq("user_id"), "ts", "event_id")
    assert(streamedState.count() == batchState.count())
    assert(streamedState.exceptAll(batchState).count() == 0)
  }

  test("stateful sessionization equals the window-based batch sessionizer") {
    val stateful = EventStreams.qStreamSessionize(spark, SfDir)
      .select("user_id", "session_seq", "n_events", "session_value")
    val batch = WindowOps.qSessionize(spark, SfDir)
      .select(col("user_id"), col("session_seq"),
        col("n_events"), col("session_value"))
    assert(stateful.count() == batch.count())
    assert(stateful.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stateful).count() == 0)
  }
}
