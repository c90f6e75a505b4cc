package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

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
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

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
