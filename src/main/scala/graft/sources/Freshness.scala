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
}
