package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.DedupOps

/** Cross-session persistence for the MinHash/LSH dedup index — the text
  * twin of [[AnnIndexStore]]: a production ingest gate holds a
  * signature/postings index of the accepted corpus and probes each new
  * batch against it; re-mining the base per session (what
  * `dedup_incremental` does by necessity of being a single query) is a
  * full-corpus pass a 100 TB ingest cannot afford per batch.
  *
  * Layout under `path`:
  *   - `shingles.parquet` (doc_id, sh)          — hashed shingle sets,
  *     the exact-verification side (the `appended_vectors` analog: an
  *     LSH-routed candidate the verifier cannot resolve would be
  *     dropped silently)
  *   - `postings.parquet` (band, bucket, doc_id) — the banded-LSH
  *     posting lists candidates are routed through
  *   - `meta.json` — corpus snapshot + frozen banding constants
  *
  * The banding configuration (shingle width, signature k, rows per
  * band) is frozen at build time and recorded in `meta.json`; append
  * and probe banding always read it from there — the MinHash analog of
  * FAISS's frozen quantizer, except nothing retrains: signatures are
  * deterministic in the text, so an append-built index is ROW-IDENTICAL
  * to a from-scratch rebuild over the grown corpus (DedupIndexSpec pins
  * that identity; for ANN the same claim is only approximate, which is
  * why [[AnnIndexStore]] documents quantizer drift instead).
  *
  * Staleness: `meta.json` records [[graft.Tables.snapshot]] of the
  * documents table at WRITE time; [[probe]] and [[append]] recompute
  * and fail loudly on mismatch — probing an index built over a
  * different corpus silently under-reports duplicates, the failure mode
  * an ingest gate exists to prevent.
  */
object DedupIndexStore {

  /** Banding constants of the shipped configuration — the values
    * `dedup_minhash_lsh`'s gate certifies recall for on this corpus. */
  val ShingleN = 3
  val SigK = 64
  val RowsPerBand = 4

  private def metaPath(path: String) = java.nio.file.Paths.get(path, "meta.json")

  /** (doc_id, sh, sig) projection under the FIXED banding config. */
  private def signed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      DedupOps.shingleHashes(graft.text.TextOps.wsTokens(col("text")), ShingleN).as("sh"))
      .withColumn("sig", DedupOps.minhashSignature(col("sh"), SigK))

  private def checkFresh(dataDir: String, path: String, op: String): Unit = {
    val meta = java.nio.file.Files.readString(metaPath(path))
    val stored = """"snapshot":"([^"]+)"""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalStateException(
        s"DedupIndexStore: meta.json at $path missing snapshot")).group(1)
    val live = graft.Tables.snapshot(s"$dataDir/documents.parquet")
    if (stored != live)
      throw new IllegalStateException(
        s"DedupIndexStore: $op against an index built over a DIFFERENT corpus " +
          s"(stored snapshot $stored, live $live) — duplicates would be " +
          "silently under-reported; rebuild with write()")
  }

  /** Build and persist the index over `docs` (doc_id, text). Starts
    * clean: a rebuild drops any prior generation's appends. */
  def write(spark: SparkSession, dataDir: String, path: String,
      docs: DataFrame): Unit = {
    LakeTable.deleteRecursively(new java.io.File(path))
    val s = signed(docs)
    s.select("doc_id", "sh").write.mode("overwrite").parquet(s"$path/shingles.parquet")
    DedupOps.bandedBuckets(s, "doc_id", "sig", RowsPerBand)
      .select("band", "bucket", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings.parquet")
    val meta =
      s"""{"snapshot":"${graft.Tables.snapshot(s"$dataDir/documents.parquet")}",""" +
        s""""shingleN":$ShingleN,"sigK":$SigK,"rowsPerBand":$RowsPerBand,"appended":0}"""
    java.nio.file.Files.writeString(metaPath(path), meta)
  }

  /** Incrementally index a batch (doc_id, text) — signatures and
    * postings computed under the FROZEN banding config and appended; the
    * base corpus is never re-mined. Write order is the crash-safety
    * invariant shared with [[AnnIndexStore.append]]: verification
    * shingles land FIRST, routable postings second — a crash between
    * the two leaves orphan shingles (harmless: nothing routes to them),
    * never postings a probe can route to but not verify. */
  def append(spark: SparkSession, dataDir: String, path: String,
      batch: DataFrame): Unit = {
    checkFresh(dataDir, path, "append")
    val s = signed(batch)
    s.select("doc_id", "sh").write.mode("append").parquet(s"$path/shingles.parquet")
    DedupOps.bandedBuckets(s, "doc_id", "sig", RowsPerBand)
      .select("band", "bucket", "doc_id")
      .write.mode("append").parquet(s"$path/postings.parquet")
    val meta = java.nio.file.Files.readString(metaPath(path))
    val n = batch.count()
    java.nio.file.Files.writeString(metaPath(path),
      """"appended":(\d+)""".r.replaceAllIn(meta,
        m => s""""appended":${m.group(1).toLong + n}"""))
  }

  /** Probe a query batch (doc_id, text) against the stored corpus:
    * band-bucket join against the postings routes candidates (shuffle
    * linear in batch + touched postings, never all-pairs), exact
    * Jaccard ≥ 0.5 against the stored shingle sets verifies. Returns
    * (doc_id, base_id, inter_n, union_n) verified pairs. Probing does
    * NOT index the batch — an ingest gate decides first, admits after
    * (that admit is [[append]]). */
  def probe(spark: SparkSession, dataDir: String, path: String,
      queries: DataFrame): DataFrame = {
    checkFresh(dataDir, path, "probe")
    val q = signed(queries)
    val postings = spark.read.parquet(s"$path/postings.parquet")
      .withColumnRenamed("doc_id", "base_id")
    // every batch-derived side is broadcast BY CONTRACT (an ingest
    // batch is bounded; the index is the corpus): the band probe
    // streams the postings scan with zero corpus shuffle, and the
    // verify streams the shingle store the same way — the plan a
    // maintained-index gate must have at 100 TB, made explicit rather
    // than left to AQE's runtime stats
    val cands = DedupOps.bandedBuckets(q, "doc_id", "sig", RowsPerBand)
      .hint("broadcast")
      .join(postings, Seq("band", "bucket"))
      .select("doc_id", "base_id").distinct()
    val baseSh = spark.read.parquet(s"$path/shingles.parquet")
      .select(col("doc_id").as("base_id"), col("sh").as("sh_b"))
    val (inter, union) = DedupOps.jaccardCounts(col("sh_a"), col("sh_b"))
    cands
      .join(q.select(col("doc_id"), col("sh").as("sh_a")), "doc_id")
      .hint("broadcast")
      .join(baseSh, "base_id")
      .filter(inter * 3 >= size(col("sh_a")) + size(col("sh_b")))
      .select(col("doc_id"), col("base_id"),
        inter.cast("long").as("inter_n"), union.cast("long").as("union_n"))
  }
}
