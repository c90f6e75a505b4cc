package graft.sources

import java.time.Instant

/** Incremental-refresh decision protocol — the reference's bulk-data
  * freshness check (/root/reference/import_cards.py:287-336: compare the
  * server's `updated_at` against the locally recorded one; download and
  * re-import only when stale).
  *
  * Pure decision logic, separated from transport: callers fetch the remote
  * watermark however they like (HTTP metadata, catalog table, object-store
  * listing) and pass both sides in. The refresh action itself is
  * [[graft.operators.MergeOps.changedRows]] + upsert.
  */
object Freshness {

  sealed trait Decision
  /** No local snapshot — full load. */
  case object InitialLoad extends Decision
  /** Remote is newer — incremental refresh (changedRows + upsert). */
  case object Refresh extends Decision
  /** Local watermark >= remote — nothing to do (the reference logs
    * "Data is up-to-date" and exits, import_cards.py:322-326). */
  case object UpToDate extends Decision

  def decide(local: Option[Instant], remote: Instant): Decision = local match {
    case None                              => InitialLoad
    case Some(l) if l.isBefore(remote)     => Refresh
    case Some(_)                           => UpToDate
  }

  /** One bulk-data catalog entry — the three fields the reference reads
    * from each item of the bulk-data API payload
    * (import_cards.py:296-316: `type`, `updated_at`, `download_uri`). */
  final case class BulkEntry(tpe: String, updatedAt: Instant, downloadUri: String)

  /** Bulk-type selection (import_cards.py:300-311): the user-facing
    * desired type `all_prints` maps to the server-side catalog type
    * `all_cards`; any other type matches verbatim; a desired type absent
    * from the catalog is a loud error naming the USER-FACING type (the
    * reference raises `RuntimeError(f"{BULK_DATA_TYPE} bulk data not
    * found")` — with the original name, not the mapped one). */
  def select(desired: String, catalog: Seq[BulkEntry]): Either[String, BulkEntry] = {
    val mapped = if (desired == "all_prints") "all_cards" else desired
    catalog.find(_.tpe == mapped).toRight(s"$desired bulk data not found")
  }

  /** Parse a bulk-data API catalog response body (the
    * `{"data":[{"type":…,"updated_at":…,"download_uri":…},…]}` payload
    * shape, import_cards.py:299-311) into [[BulkEntry]] rows via the
    * schema'd Spark JSON reader — the same parse discipline as the card
    * ingest, so a malformed catalog fails loudly instead of matching
    * nothing. The catalog is API metadata (a handful of entries), so
    * collecting it to the driver is bounded-metadata by construction. */
  def parseCatalog(spark: org.apache.spark.sql.SparkSession, body: String): Seq[BulkEntry] = {
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.types._
    val spark2 = spark
    import spark2.implicits._
    val schema = StructType(Seq(StructField("data", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("updated_at", StringType),
      StructField("download_uri", StringType)))))))
    spark.read.schema(schema).json(Seq(body).toDS())
      .select(explode(col("data")).as("e"))
      .select(col("e.type"), col("e.updated_at"), col("e.download_uri"))
      .collect()
      .map(r => BulkEntry(r.getString(0),
        Instant.parse(r.getString(1)), r.getString(2)))
      .toSeq
  }

  /** One full refresh-protocol step against a bulk server (the reference's
    * `download_latest_json`, import_cards.py:287-336): query the catalog,
    * [[select]] the desired bulk type (loud error with the USER-FACING
    * name on a miss), [[decide]] against the local landing file's mtime,
    * and on InitialLoad/Refresh download the payload, land it, and pin
    * the file mtime to the server's `updated_at` (the reference's
    * os.utime — the mtime IS the local watermark, so the next run's
    * decide() sees exactly what this run recorded). Returns the decision
    * and whether a download happened. */
  def refreshIfStale(
      spark: org.apache.spark.sql.SparkSession,
      server: InMemoryBulkServer,
      desired: String,
      localFile: java.io.File): (Decision, Boolean) = {
    val catalog = parseCatalog(spark, server.getCatalog())
    val entry = select(desired, catalog).fold(
      err => throw new RuntimeException(err), identity)
    val local =
      if (localFile.exists) Some(Instant.ofEpochMilli(localFile.lastModified))
      else None
    val d = decide(local, entry.updatedAt)
    val download = d != UpToDate
    if (download) {
      val body = server.download(entry.downloadUri)
      java.nio.file.Files.writeString(localFile.toPath, body)
      require(localFile.setLastModified(entry.updatedAt.toEpochMilli),
        s"cannot pin mtime on $localFile")
    }
    (d, download)
  }
}

/** An APPLYING in-memory stand-in for the bulk-data HTTP endpoint — the
  * role [[graft.sources.InMemoryUpsertDb]] plays for the JDBC write
  * protocol, on the read side: it SERVES the catalog JSON body and the
  * payload bytes per download URI and counts every request, so the
  * driver-contract entry can hash-gate the whole
  * catalog→select→decide→conditional-download protocol end to end — a
  * decide() that re-downloads on a fresh hit or skips a stale refresh
  * changes the request counters and the landed table state, and breaks
  * the oracle. In production the same client code points at the real
  * HTTP endpoint; the stand-in is the sandboxed transport, not a
  * different protocol. */
final class InMemoryBulkServer {
  @volatile private var catalogJson: String = """{"data":[]}"""
  private val payloads =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val catalogGets = new java.util.concurrent.atomic.AtomicLong()
  private val downloadGets = new java.util.concurrent.atomic.AtomicLong()

  def publishCatalog(json: String): Unit = catalogJson = json
  def publishPayload(uri: String, body: String): Unit = { payloads.put(uri, body); () }
  def getCatalog(): String = { catalogGets.incrementAndGet(); catalogJson }
  def download(uri: String): String = {
    downloadGets.incrementAndGet()
    Option(payloads.get(uri)).getOrElse(
      throw new java.io.IOException(s"404 Not Found: $uri"))
  }
  def nCatalogGets: Long = catalogGets.get
  def nDownloads: Long = downloadGets.get
}
