package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `spark.read.format("graftlake")` — the [[LakeTable]] surfaced as a
  * registered Spark data source, so the WHOLE SQL surface (views, joins,
  * any downstream operator) runs over lake snapshots without callers
  * touching the manifest API:
  *
  * {{{
  * spark.read.format("graftlake")
  *   .option("versionAsOf", "3")           // or timestampAsOf=epochMs
  *   .load("/lake/orders")
  *   .createOrReplaceTempView("orders_v3")
  * spark.sql("SELECT ... FROM orders_v3 WHERE o_orderkey BETWEEN 1 AND 9")
  * }}}
  *
  * Snapshot pinning: the version resolves ONCE at `load` time (latest if
  * no option), so the relation keeps reading that manifest's file set —
  * the same isolation contract as [[LakeTable.read]].
  *
  * Filter pushdown: Catalyst hands the relation its pushable predicates
  * ([[PrunedFilteredScan]]); comparison/equality filters on stats
  * columns prune MANIFEST entries before any file opens (the same
  * `entryMatches` kernel as [[LakeTable.scanBox]]), and column pruning
  * reaches the parquet scan through the projected read. Every filter is
  * declared unhandled, so Spark re-applies the exact residual above the
  * scan — pruning here is a file-count optimization, never a row-level
  * correctness dependency. Equality-delete sidecars apply inside the
  * scan ([[LakeTable.readEntries]]), so a DV table reads correctly
  * through SQL too.
  */
class GraftLakeSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  // ---- streaming source: the lake's CHANGE FEED as a readStream (the
  // Delta streaming-source shape proper — each micro-batch is a range
  // of commit versions, each row a CDC event with pre-image columns and
  // `_commit_version`) ----

  private def streamParams(parameters: Map[String, String]): (String, Int) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlake: 'path' is required"))
    // default: stream only commits AFTER stream start (the tail-the-log
    // posture); startingVersion=N replays history from version N+1 on
    val startingVersion = parameters.get("startingVersion").map(_.trim.toInt)
      .getOrElse(LakeTable.latestVersion(path))
    (path, startingVersion)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graftlake: the stream schema is the table's + CDC columns; do not supply one")
    val (path, _) = streamParams(parameters)
    (shortName(), GraftLakeStreamSource.cdcSchema(path))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val (path, startingVersion) = streamParams(parameters)
    new GraftLakeStreamSource(sqlContext.sparkSession, path, startingVersion)
  }

  // ---- streaming sink: each micro-batch commits ONE atomic lake
  // version (create on first batch, keyed latest-wins MERGE after) ----

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlake: 'path' is required"))
    val keys = parameters.getOrElse("keys", throw new IllegalArgumentException(
      "graftlake: 'keys' is required — the comma-separated merge identity columns"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(outputMode != OutputMode.Complete(),
      "graftlake sink: Complete mode would rewrite the table per batch — " +
        "use append/update (each micro-batch merges as one version)")
    val nBuckets = parameters.get("nBuckets").map(_.trim.toInt).getOrElse(8)
    val layout = parameters.getOrElse("layout", "hash")
    new GraftLakeSink(path, keys, nBuckets, layout)
  }

  /** `df.write.format("graftlake").option("keys", "k1,k2").mode(...)`:
    *   - Overwrite      — (re)create the table as a fresh version 1
    *   - Append         — keyed latest-wins MERGE (create if missing) —
    *                      the transactional upsert, not a blind file add
    *   - ErrorIfExists  — create, loud if the table exists
    *   - Ignore         — create only if missing
    * `keys` is required (the table's merge/DV identity); `nBuckets` and
    * `layout` (hash|range|zorder) pass through to [[LakeTable.create]]. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlake: 'path' is required — df.write.format(\"graftlake\").save(<table dir>)"))
    val keys = parameters.getOrElse("keys", throw new IllegalArgumentException(
      "graftlake: 'keys' is required — the comma-separated merge identity columns"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val nBuckets = parameters.get("nBuckets").map(_.trim.toInt).getOrElse(8)
    val layout = parameters.getOrElse("layout", "hash")
    val spark = sqlContext.sparkSession
    val exists = LakeTable.latestVersion(path) > 0
    mode match {
      case SaveMode.Overwrite =>
        LakeTable.deleteRecursively(new java.io.File(path))
        LakeTable.create(spark, path, data, keys, nBuckets, layout)
      case SaveMode.Append =>
        if (exists) LakeTable.merge(spark, path, data, keys)
        else LakeTable.create(spark, path, data, keys, nBuckets, layout)
      case SaveMode.ErrorIfExists =>
        LakeTable.create(spark, path, data, keys, nBuckets, layout) // refuses if present
      case SaveMode.Ignore =>
        if (!exists) LakeTable.create(spark, path, data, keys, nBuckets, layout)
    }
    new GraftLakeRelation(sqlContext, path, LakeTable.latestVersion(path))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlake: 'path' is required — spark.read.format(\"graftlake\").load(<table dir>)"))
    require(!(parameters.contains("versionAsOf") && parameters.contains("timestampAsOf")),
      "graftlake: versionAsOf and timestampAsOf are mutually exclusive")
    val version = parameters.get("versionAsOf").map(_.trim.toInt)
      .orElse(parameters.get("timestampAsOf").map(t =>
        LakeTable.versionAsOf(path, t.trim.toLong)))
      .getOrElse(LakeTable.latestVersion(path))
    new GraftLakeRelation(sqlContext, path, version)
  }
}

object GraftLakeSource {
  /** Last (kept, total) manifest-pruning decision — observability hook
    * for specs asserting the pushdown actually cut the file list (the
    * BucketingSpec quantitative-skip convention). */
  @volatile private[graft] var lastPrune: (Int, Int) = (0, 0)
}

private[graft] class GraftLakeRelation(val sqlContext: SQLContext,
    path: String, version: Int)
    extends BaseRelation with PrunedFilteredScan {

  private val m = LakeTable.manifest(path, version)

  override def schema: StructType = m.schema

  // every filter is re-applied by Spark above the scan: pushdown here
  // is file-level pruning only
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** Source filters → per-column stats intervals (conservative:
    * unsupported shapes prune nothing; strict bounds widen to
    * inclusive). */
  private def toIntervals(f: Filter): Seq[(String, Option[Any], Option[Any])] = f match {
    case EqualTo(c, v) => Seq((c, Some(v), Some(v)))
    case GreaterThan(c, v) => Seq((c, Some(v), None))
    case GreaterThanOrEqual(c, v) => Seq((c, Some(v), None))
    case LessThan(c, v) => Seq((c, None, Some(v)))
    case LessThanOrEqual(c, v) => Seq((c, None, Some(v)))
    case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
      // the IN set's envelope — sound (a superset interval), and enough
      // to prune point-lookup batches on a clustered key
      (vs.head match {
        case _: Number =>
          Seq((c, Some(vs.minBy(v => v.asInstanceOf[Number].doubleValue())),
            Some(vs.maxBy(v => v.asInstanceOf[Number].doubleValue()))))
        case _: String =>
          Seq((c, Some(vs.map(_.toString).min), Some(vs.map(_.toString).max)))
        case _ => Seq.empty
      })
    case And(l, r) => toIntervals(l) ++ toIntervals(r)
    case _ => Seq.empty // Or / IsNull / StringContains / ... : no pruning
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val preds = filters.toSeq.flatMap(toIntervals)
    val kept = m.files.filter(LakeTable.entryMatches(_, preds))
    GraftLakeSource.lastPrune = (kept.size, m.files.size)
    val df = LakeTable.readEntries(sqlContext.sparkSession, m, kept)
    df.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}

/** Commit-version offset for the streaming source — one integer, the
  * manifest log IS the write-ahead log. Restarted queries replay
  * version ranges from the checkpoint; a range whose manifests were
  * vacuumed away fails loudly (manifest-missing), never silently skips. */
private[graft] case class GraftLakeVersionOffset(v: Int)
    extends org.apache.spark.sql.execution.streaming.Offset {
  override def json: String = v.toString
}

private[graft] object GraftLakeStreamSource {
  /** The CDC row shape, pinned at stream start: key columns,
    * `_change_type`, the after-image non-key columns, their
    * `_before_*` pre-images, `_commit_version`. A schema-evolving
    * commit mid-stream changes the feed's shape and fails the running
    * query loudly (restart resolves the new schema) — the Delta
    * streaming-source contract. */
  def cdcSchema(path: String): StructType = {
    val m = LakeTable.manifest(path,
      math.max(1, LakeTable.latestVersion(path)))
    val keySet = m.keys.toSet
    val keyFields = m.schema.filter(f => keySet(f.name))
    val rest = m.schema.filterNot(f => keySet(f.name))
    StructType(keyFields ++ Seq(StructField("_change_type", StringType)) ++
      rest.map(f => StructField(f.name, f.dataType, nullable = true)) ++
      rest.map(f => StructField(s"_before_${f.name}", f.dataType, nullable = true)) :+
      StructField("_commit_version", LongType, nullable = false))
  }
}

/** V1 streaming Source over the lake's manifest log: `getOffset` is the
  * latest committed version, `getBatch((a, b])` is the union of the
  * O(delta) change feeds of versions a+1..b. Everything the batch CDC
  * read guarantees carries over — only churned files are scanned,
  * deletion-vector commits stream as deletes, rewritten-verbatim rows
  * stay silent. */
private[graft] class GraftLakeStreamSource(spark: SparkSession,
    path: String, startingVersion: Int)
    extends org.apache.spark.sql.execution.streaming.Source {

  private val declared = GraftLakeStreamSource.cdcSchema(path)
  private val keys = LakeTable.manifest(path,
    math.max(1, LakeTable.latestVersion(path))).keys

  override def schema: StructType = declared

  private def parse(o: org.apache.spark.sql.execution.streaming.Offset): Int =
    o.json.trim.toInt

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val l = LakeTable.latestVersion(path)
    if (l > startingVersion) Some(GraftLakeVersionOffset(l)) else None
  }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val from = start.map(parse).getOrElse(startingVersion)
    val to = parse(end)
    val feed = (from + 1 to to).map { v =>
      LakeTable.changes(spark, path, v - 1, v, keys, includeBefore = true)
        .withColumn("_commit_version", lit(v.toLong))
    }.reduce(_ unionByName _)
    val aligned = feed.select(declared.map(f => col(f.name)).toSeq: _*)
    require(aligned.schema.map(f => (f.name, f.dataType)) ==
      declared.map(f => (f.name, f.dataType)),
      s"graftlake stream: the table's schema evolved mid-stream " +
        s"(${aligned.schema.map(_.name).mkString(",")} vs declared " +
        s"${declared.map(_.name).mkString(",")}) — restart the query to " +
        "pick up the new CDC shape")
    org.apache.spark.sql.graft.ColumnBridge.streamingDataFrame(
      spark, aligned.queryExecution.toRdd, declared)
  }

  override def stop(): Unit = ()
}

/** V1 streaming Sink: each micro-batch commits ONE atomic lake version —
  * create on the first batch, keyed latest-wins MERGE after (the
  * declarative form of `stream_lake_sink`'s foreachBatch loop). Batch
  * replays after a crash re-merge and converge (the election is
  * idempotent; versions are history, not state). Callers owning
  * cross-batch recency pre-collapse per key upstream. */
private[graft] class GraftLakeSink(path: String, keys: Seq[String],
    nBuckets: Int, layout: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // rebind the micro-batch's rows to a plain batch frame (addBatch's
    // frame is bound to the IncrementalExecution); copy() because the
    // scan reuses UnsafeRow buffers
    val batch = org.apache.spark.sql.graft.ColumnBridge.batchDataFrame(
      spark, data.queryExecution.toRdd.map(_.copy()), data.schema)
    if (LakeTable.latestVersion(path) == 0) {
      LakeTable.create(spark, path, batch, keys, nBuckets, layout)
      ()
    } else {
      LakeTable.merge(spark, path, batch, keys)
      ()
    }
  }
}
