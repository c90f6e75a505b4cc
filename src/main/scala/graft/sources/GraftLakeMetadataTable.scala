package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{IntegerType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL METADATA TABLES (r17 — VERDICT r16 ask #8, the Iceberg
  * metadata-table shape): `SELECT * FROM <cat>.<t>.history` and
  * `... <t>.files` resolve through the catalog to manifest-backed
  * relations — ZERO data I/O, the log is the only thing read. `CALL
  * system.history` already existed, but BI tools speak SELECT; these
  * give the same facts as first-class relations (joinable, filterable,
  * ORDER BY-able like any table).
  *
  *   - `history`: one row per retained version — version, op, n_files,
  *     n_dvs, committed_at (the manifest file's own mtime, the same
  *     clock TIMESTAMP AS OF resolves against). `snapshots` is an
  *     alias of it under the Iceberg metadata-table name (the lake's
  *     versions ARE its snapshots).
  *   - `files`: one row per CURRENT-snapshot manifest entry — path,
  *     bucket (-1 = unclustered), n_dvs (equality sidecars), n_pos_dvs
  *     (positional sidecars), partition (`k=v` rendering of the
  *     entry's directory values).
  *
  * Resolution: `cat.t.history` reaches [[GraftLakeCatalog.loadTable]]
  * as Identifier(namespace=[t], name=history); when no real table
  * exists at that path but the NAMESPACE itself is a lake table, the
  * metadata relation loads. A real table named `history` under a
  * namespace wins (checked first), so no legal layout is shadowed. */
private[graft] class GraftLakeMetadataTable(tablePath: String, kind: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  override def name(): String = s"graftlake `$tablePath`.$kind"
  override def schema(): StructType = GraftLakeMetadataTable.schemaOf(kind)
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def rows(): Array[InternalRow] =
            GraftLakeMetadataTable.rows(tablePath, kind)
          override def readSchema(): StructType =
            GraftLakeMetadataTable.schemaOf(kind)
          override def description(): String =
            s"graftlake metadata $kind (manifest-only, zero data I/O)"
        }
    }
}

private[graft] object GraftLakeMetadataTable {
  val names: Set[String] = Set("history", "files", "snapshots")

  def schemaOf(kind: String): StructType = kind match {
    // `snapshots` is an ALIAS of `history` under the Iceberg metadata
    // table's name — same manifest facts, same shape (the lake's
    // versions ARE its snapshots; there is no separate snapshot id)
    case "history" | "snapshots" => new StructType()
      .add("version", IntegerType, nullable = false)
      .add("op", StringType, nullable = false)
      .add("n_files", IntegerType, nullable = false)
      .add("n_dvs", IntegerType, nullable = false)
      .add("committed_at", TimestampType, nullable = false)
    case "files" => new StructType()
      .add("path", StringType, nullable = false)
      .add("bucket", IntegerType, nullable = false)
      .add("n_dvs", IntegerType, nullable = false)
      .add("n_pos_dvs", IntegerType, nullable = false)
      .add("partition", StringType, nullable = false)
    case other => throw new IllegalArgumentException(
      s"graftlake: unknown metadata table $other")
  }

  def rows(path: String, kind: String): Array[InternalRow] = kind match {
    case "history" | "snapshots" =>
      val hist = LakeTable.history(path)
      // one store resolution for all versions, not one per row
      val times = LakeTable.commitTimestamps(path, hist.map(_._1))
      hist.map { case (v, op, nf, nd) =>
        InternalRow(v, UTF8String.fromString(op), nf, nd, times(v) * 1000L)
      }.toArray
    case "files" =>
      val m = LakeTable.manifest(path, LakeTable.latestVersion(path))
      m.files.map { e =>
        InternalRow(UTF8String.fromString(e.path), e.bucket, e.dvs.size,
          e.pos.size,
          UTF8String.fromString(
            e.part.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
              .mkString(",")))
      }.toArray
  }
}
