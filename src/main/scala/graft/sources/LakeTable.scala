package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned lake table with copy-on-write MERGE and as-of
  * reads — the transactional story a 100 TB lake runs on (the
  * manifest-file pattern of Delta/Iceberg, reduced to its load-bearing
  * core; cf. reference import_cards.py:214-225, whose operational loop
  * is an idempotent re-runnable upsert — this is that upsert with
  * snapshot isolation instead of an in-place table).
  *
  * Layout under `path`:
  *   - `data/<batch-dirs>/part-*.parquet` — immutable data files
  *   - `_log/v00001.json`, `_log/v00002.json`, … — one manifest per
  *     committed version, each holding the COMPLETE leaf-file list of
  *     its snapshot (metadata-scale: O(#files), never O(rows))
  *
  * Invariants:
  *   - Data files are never mutated or deleted by a commit; a new
  *     version publishes a new manifest that REFERENCES files. A reader
  *     resolved to version N therefore sees exactly N's file set for
  *     the life of its query — no torn reads during concurrent commits
  *     (the stage-and-swap window `stream_upsert_sink` documents is
  *     closed).
  *   - Manifest publish is atomic: written to a temp name, then
  *     ATOMIC_MOVE'd to `v%05d.json`. A crash mid-commit leaves orphan
  *     data files (harmless — unreferenced) and no manifest; the table
  *     stays at its previous version.
  *   - Optimistic concurrency: the move refuses to replace an existing
  *     manifest, so two writers racing to commit the same version fail
  *     loudly instead of silently last-wins-ing a snapshot away.
  *
  * MERGE is file-granular copy-on-write (the Delta CoW shape): the
  * update batch's keys are broadcast against the snapshot scan tagged
  * with `input_file_name()` to find the TOUCHED files; only those are
  * rewritten (their unmatched rows + the whole batch), and every
  * untouched file carries into the new manifest by reference. At scale
  * the merge cost is O(batch + touched files), not O(table) — the
  * property that makes a daily upsert into a 100 TB table affordable.
  */
object LakeTable {

  private def logDir(path: String) = java.nio.file.Paths.get(path, "_log")
  private def manifestPath(path: String, v: Int) =
    logDir(path).resolve(f"v$v%05d.json")

  /** Leaf parquet part-files under a just-written batch directory
    * (recursive — partitionBy writes nest one level of key dirs). */
  private def leafFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
  }

  private[graft] def writeManifest(path: String, version: Int, files: Seq[String],
      op: String): Unit = {
    java.nio.file.Files.createDirectories(logDir(path))
    val json =
      s"""{"version":$version,"op":"$op","files":[""" +
        files.map(f => "\"" + f + "\"").mkString(",") + "]}"
    val tmp = logDir(path).resolve(s".tmp-v$version-${java.util.UUID.randomUUID()}.json")
    java.nio.file.Files.writeString(tmp, json)
    // publish = hard-link the fully-written temp to the version name:
    // link creation is atomic AND fails on an existing target (rename
    // would silently REPLACE on POSIX — last-wins, the exact lost-commit
    // a versioned log must refuse)
    try java.nio.file.Files.createLink(manifestPath(path, version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.delete(tmp)
        throw new IllegalStateException(
          s"LakeTable: concurrent commit conflict — version $version at $path " +
            "already exists; re-read the latest snapshot and retry the merge")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** Latest committed version (0 if the table does not exist yet). */
  def latestVersion(path: String): Int = {
    val d = logDir(path).toFile
    val vs = Option(d.listFiles).getOrElse(Array.empty).toSeq
      .map(_.getName).collect { case s if s.matches("v\\d{5}\\.json") =>
        s.substring(1, 6).toInt }
    if (vs.isEmpty) 0 else vs.max
  }

  /** The file list of a committed version. */
  def manifestFiles(path: String, version: Int): Seq[String] = {
    val p = manifestPath(path, version)
    require(java.nio.file.Files.exists(p),
      s"LakeTable: no committed version $version at $path (latest is ${latestVersion(path)})")
    val json = java.nio.file.Files.readString(p)
    """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json) match {
      case Some(m) if m.group(1).trim.isEmpty => Seq.empty
      case Some(m) => m.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
      case None => throw new IllegalStateException(s"LakeTable: corrupt manifest $p")
    }
  }

  /** Snapshot read. `asOf = None` resolves the latest version AT CALL
    * TIME and pins it: the returned frame keeps reading that version's
    * file set even if later versions commit before the query runs —
    * snapshot isolation, not read-latest-eventually. */
  def read(spark: SparkSession, path: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(path))
    val files = manifestFiles(path, v)
    require(files.nonEmpty, s"LakeTable: version $v at $path references no files")
    // mergeSchema: a schema-evolving merge leaves a snapshot whose
    // carried files lack the new column(s) — the union schema is the
    // table's schema, old rows null in new columns (a version whose
    // files are homogeneous pays one footer merge and reads the same)
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Create the table as version 1 from `df`. The data lands in
    * `nBuckets` separate batch directories split by key hash, so the
    * table starts with enough file granularity for copy-on-write merges
    * to show their O(touched) cost even on small test tables (a real
    * table gets granularity for free from its ingest parallelism). */
  def create(spark: SparkSession, path: String, df: DataFrame,
      keyCols: Seq[String], nBuckets: Int = 8): Int = {
    require(latestVersion(path) == 0,
      s"LakeTable: table at $path already exists (version ${latestVersion(path)})")
    val bucket = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets))
    val dir = s"$path/data/create"
    // ONE pass: repartition on the key-hash EXPRESSION (no synthetic
    // column lands in the schema, no partition-dir inference on read) —
    // each shuffle partition writes one flat part file, so the table
    // starts with key-clustered file granularity
    df.repartition(nBuckets, bucket)
      .write.mode("overwrite").parquet(dir)
    writeManifest(path, 1, leafFiles(dir), "create")
    1
  }

  /** Copy-on-write MERGE (latest-wins keyed upsert): rows of `updates`
    * replace snapshot rows with equal keys; unmatched update rows
    * insert. Only data files that CONTAIN a matched key are rewritten;
    * all others carry into the new manifest by reference. Returns the
    * committed version.
    *
    * Schema evolution: an update batch may carry NEW columns — the
    * rewrite unions by name with missing columns allowed, so surviving
    * old rows get nulls, untouched files keep their old schema on disk,
    * and [[read]]'s mergeSchema presents the union. Duplicate keys
    * WITHIN one batch are the caller's contract (pre-collapse with a
    * latest-by-key election — see `stream_lake_sink` — or both rows
    * land). */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String]): Int = {
    val current = latestVersion(path)
    require(current > 0, s"LakeTable: cannot merge into missing table at $path")
    val files = manifestFiles(path, current)
    val snap = spark.read.parquet(files: _*)
    val keys = updates.select(keyCols.map(col): _*)
    // touched-file discovery: ONE scan of the snapshot with a broadcast
    // semi-join on the (small) batch keys — no shuffle of the table
    val touched = snap.withColumn("__file", input_file_name())
      .join(broadcast(keys), keyCols, "left_semi")
      .select("__file").distinct()
      .collect().map(r => new java.net.URI(r.getString(0)).getPath) // input_file_name
      .toSet // is a file:// URI; manifests store plain paths. Bounded: ≤ #files.
    // rewrite = surviving rows of touched files + the whole batch
    val touchedSeq = touched.toSeq.sorted
    val rewriteDir = s"$path/data/merge-v${current + 1}"
    val survivors =
      if (touchedSeq.isEmpty) updates
      else spark.read.option("mergeSchema", "true").parquet(touchedSeq: _*)
        .join(broadcast(keys), keyCols, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    survivors.write.mode("overwrite").parquet(rewriteDir)
    val newFiles = files.filterNot(touched) ++ leafFiles(rewriteDir)
    writeManifest(path, current + 1, newFiles, "merge")
    current + 1
  }

  /** Copy-on-write DELETE: snapshot rows whose keys appear in `keys`
    * vanish from the NEW version; only files containing a matched key
    * are rewritten. Note the time-travel/erasure distinction a real
    * lake must manage: older versions still reference the untouched
    * pre-delete files, so the rows remain READABLE via as-of until
    * [[vacuum]] expires those versions — the Delta GDPR recipe is
    * exactly DELETE + VACUUM, and LakeTableSpec pins both halves. */
  def delete(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String]): Int = {
    val current = latestVersion(path)
    require(current > 0, s"LakeTable: cannot delete from missing table at $path")
    val files = manifestFiles(path, current)
    val snap = spark.read.parquet(files: _*)
    val keyRows = keys.select(keyCols.map(col): _*)
    val touched = snap.withColumn("__file", input_file_name())
      .join(broadcast(keyRows), keyCols, "left_semi")
      .select("__file").distinct()
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    val touchedSeq = touched.toSeq.sorted
    val newFiles =
      if (touchedSeq.isEmpty) files // no-op delete still commits (idempotent replays)
      else {
        val rewriteDir = s"$path/data/delete-v${current + 1}"
        spark.read.parquet(touchedSeq: _*)
          .join(broadcast(keyRows), keyCols, "left_anti")
          .write.mode("overwrite").parquet(rewriteDir)
        files.filterNot(touched) ++ leafFiles(rewriteDir)
      }
    writeManifest(path, current + 1, newFiles, "delete")
    current + 1
  }

  /** Compaction (the OPTIMIZE table service): rewrite the CURRENT
    * snapshot's rows as `targetFiles` files and commit the result as a
    * new version — the maintenance pass that heals the small-file
    * accumulation CoW merges/deletes leave behind (every touched-file
    * rewrite plus carried singles fragments the layout; scan task count
    * eventually tracks commit count instead of data size). State is
    * bit-identical by construction — the commit only re-binds the same
    * rows to fewer files — and readers pinned to pre-compaction
    * versions keep their file sets (nothing is deleted until
    * [[vacuum]]). Returns the committed version. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Int = {
    require(targetFiles > 0, s"LakeTable: compact needs targetFiles > 0, got $targetFiles")
    val current = latestVersion(path)
    require(current > 0, s"LakeTable: cannot compact missing table at $path")
    val dir = s"$path/data/compact-v${current + 1}"
    read(spark, path).repartition(targetFiles)
      .write.mode("overwrite").parquet(dir)
    writeManifest(path, current + 1, leafFiles(dir), "compact")
    current + 1
  }

  /** Change feed between two committed versions — the CDC read the
    * manifest format gives for free (Delta's CDF shape, computed as a
    * snapshot diff): one keyed full-outer join of the two as-of reads
    * classifies every key as insert (absent before), delete (absent
    * after), or update (present in both with any non-key column
    * changed); unchanged keys are not emitted. Returns the key columns
    * + `_change_type` + the after-image non-key columns (null for
    * deletes); with `includeBefore` also `_before_<col>` pre-images
    * (null for inserts) — what an incremental consumer needs to RETRACT
    * the old contribution before applying the new one (Delta CDF's
    * preimage/postimage, folded into one row per key). Scale shape: two
    * snapshot scans + ONE keyed shuffle — and file-granular CoW makes a
    * smarter diff possible (skip files carried by reference between the
    * versions); at test file counts the straight diff is the honest
    * baseline. */
  def changes(spark: SparkSession, path: String, fromV: Int, toV: Int,
      keyCols: Seq[String], includeBefore: Boolean = false): DataFrame = {
    require(fromV < toV, s"LakeTable.changes: fromV $fromV must precede toV $toV")
    val before = read(spark, path, Some(fromV))
    val after = read(spark, path, Some(toV))
    require(before.columns.sorted.sameElements(after.columns.sorted),
      "LakeTable.changes: versions differ in schema " +
        s"(${before.columns.mkString(",")} vs ${after.columns.mkString(",")}) — " +
        "diff across a schema-evolving commit needs an explicit column policy; " +
        "project both sides to a shared schema first")
    val rest = before.columns.filterNot(keyCols.contains).toSeq
    def tag(df: DataFrame, t: String) = df.select(
      keyCols.map(col) ++ rest.map(c => col(c).as(s"${t}_$c")) :+ lit(true).as(s"__in_$t"): _*)
    tag(before, "b").join(tag(after, "a"), keyCols, "full_outer")
      .withColumn("_change_type",
        when(col("__in_b").isNull, "insert")
          .when(col("__in_a").isNull, "delete")
          .when(rest.map(c => !(col(s"b_$c") <=> col(s"a_$c"))).reduce(_ || _), "update"))
      .filter(col("_change_type").isNotNull)
      .select(keyCols.map(col) ++ (col("_change_type") +:
        rest.map(c => col(s"a_$c").as(c))) ++
        (if (includeBefore) rest.map(c => col(s"b_$c").as(s"_before_$c"))
         else Seq.empty): _*)
  }

  /** Expire history: keep the newest `keepLast` versions, drop older
    * manifests, and physically delete every data file no kept manifest
    * references. This is what turns a logical [[delete]] into erasure —
    * and what bounds a long-lived table's storage at ~keepLast
    * snapshots of churned files (carried-by-reference files are shared
    * across manifests and survive). Readers pinned to an expired
    * version fail loudly on their next resolution ([[manifestFiles]]'s
    * missing-version error), never silently read surviving files.
    * Returns (manifests dropped, data files deleted). */
  def vacuum(path: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, s"LakeTable: vacuum must keep >= 1 version, got $keepLast")
    val latest = latestVersion(path)
    require(latest > 0, s"LakeTable: cannot vacuum missing table at $path")
    val keepFrom = math.max(1, latest - keepLast + 1)
    val kept = (keepFrom to latest).flatMap(v => manifestFiles(path, v)).toSet
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    // delete order matters for crash safety: orphan DATA files first,
    // manifests second — a crash mid-vacuum leaves expired manifests
    // pointing at missing files (loud read failure on an already-expired
    // version), never a live manifest with missing files
    val orphans = walk(new java.io.File(s"$path/data"))
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .filterNot(f => kept(f.getAbsolutePath))
    orphans.foreach { f =>
      if (!f.delete()) throw new IllegalStateException(
        s"LakeTable: vacuum cannot delete ${f.getPath}")
    }
    var dropped = 0
    (1 until keepFrom).foreach { v =>
      if (java.nio.file.Files.deleteIfExists(manifestPath(path, v))) dropped += 1
    }
    (dropped, orphans.size)
  }

  private[graft] def deleteRecursively(f: java.io.File): Unit =
    if (f.exists) {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRecursively)
      if (!f.delete())
        throw new IllegalStateException(s"LakeTable: cannot delete ${f.getPath}")
    }
}
