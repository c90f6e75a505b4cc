package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps
import graft.similarity.SimilarityOps.IvfPqIndex

/** Cross-SESSION persistence for the IVF+PQ serving index — the piece
  * that turns the per-JVM [[graft.SessionCache]] build-once/serve-many
  * split into the real deployment shape: at 100 TB the index build (a
  * full-corpus k-means assignment + PQ encode) is a batch job whose
  * output OUTLIVES the JVM, and serving sessions load it instead of
  * rebuilding (FAISS writes .index files; a lakehouse writes index
  * TABLES — this store does the latter, so the index is itself
  * queryable, partition-prunable parquet).
  *
  * Layout under `path`:
  *   - `cells.parquet`    (cell, cvec, cnorm)         — probe-able quantizer
  *   - `codes.parquet`    (vec_id, cell, codes)       — the 8-byte/vector corpus
  *   - `codebook.parquet` (block, code, cvec)         — residual PQ codebook
  *   - `meta.json`        snapshot + capacity constants
  *
  * Staleness: `meta.json` records [[graft.Tables.snapshot]] of the
  * embeddings table at WRITE time; [[read]] recomputes it and fails
  * loudly on mismatch — serving from an index built over a different
  * corpus returns silently-wrong neighbors, the worst failure mode an
  * ANN store can have. Pass `allowStale = true` only for forensics.
  */
object AnnIndexStore {

  private def metaPath(path: String) = java.nio.file.Paths.get(path, "meta.json")

  private def deleteRecursively(f: java.io.File): Unit =
    if (f.exists) {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRecursively)
      if (!f.delete())
        throw new IllegalStateException(s"AnnIndexStore: cannot delete ${f.getPath}")
    }

  /** Build (via the session cache — free if already built) and persist
    * the serving index for the corpus at `dataDir`. */
  def write(spark: SparkSession, dataDir: String, path: String): Unit = {
    // a REBUILD invalidates any prior generation's appended vectors:
    // left behind, serve() would silently union them into the rerank
    // base (and an id that joined the new corpus would produce duplicate
    // candidate rows in the top-10) — the rebuild-when-recall-sags
    // lifecycle starts from a clean appended set, and the fresh
    // meta.json below drops the stale "appended" count with it
    deleteRecursively(new java.io.File(s"$path/appended_vectors.parquet"))
    val idx = SimilarityOps.buildIvfPqIndex(spark, dataDir)
    idx.cells.write.mode("overwrite").parquet(s"$path/cells.parquet")
    idx.withCodes.write.mode("overwrite").parquet(s"$path/codes.parquet")
    val spark2 = spark
    import spark2.implicits._
    idx.codebook.zipWithIndex.flatMap { case (cells, b) =>
      cells.zipWithIndex.map { case (c, k) => (b, k, c.toSeq) }
    }.toSeq.toDF("block", "code", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook.parquet")
    val meta =
      s"""{"snapshot":"${graft.Tables.snapshot(s"$dataDir/embeddings.parquet")}",""" +
        s""""nCells":${idx.nCells},"blocks":${idx.codebook.length},""" +
        s""""codes":${idx.codebook.head.length}}"""
    java.nio.file.Files.writeString(metaPath(path), meta)
  }

  /** Load a persisted index for serving against `dataDir`. */
  def read(spark: SparkSession, dataDir: String, path: String,
      allowStale: Boolean = false): IvfPqIndex = {
    val meta = java.nio.file.Files.readString(metaPath(path))
    def field(k: String): String =
      s""""$k":"?([^",}]+)"?""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalStateException(
          s"AnnIndexStore: meta.json at $path missing field $k"))
        .group(1)
    val storedSnap = field("snapshot")
    val liveSnap = graft.Tables.snapshot(s"$dataDir/embeddings.parquet")
    if (storedSnap != liveSnap && !allowStale)
      throw new IllegalStateException(
        s"AnnIndexStore: index at $path was built over a DIFFERENT corpus " +
          s"(stored snapshot $storedSnap, live $liveSnap) — serving it would " +
          "return wrong neighbors; rebuild with write(), or pass " +
          "allowStale=true for forensics only")
    val nCells = field("nCells").toInt
    val blocks = field("blocks").toInt
    val codes = field("codes").toInt
    val cbRows = spark.read.parquet(s"$path/codebook.parquet")
      .select("block", "code", "cvec").collect()
    require(cbRows.length == blocks * codes,
      s"AnnIndexStore: codebook has ${cbRows.length} rows, expected ${blocks * codes}")
    val codebook = Array.ofDim[Array[Double]](blocks, codes)
    cbRows.foreach { r =>
      codebook(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    IvfPqIndex(
      spark.read.parquet(s"$path/cells.parquet"),
      spark.read.parquet(s"$path/codes.parquet"),
      codebook,
      nCells)
  }

  /** Serve top-k from a LOADED index (queries + exact-rerank vectors
    * read from the live corpus at `dataDir`, UNION any vectors indexed
    * by [[append]] — their full vectors live in the store precisely so
    * the exact rerank can return them; an ADC-ranked candidate the
    * rerank cannot resolve would otherwise be dropped silently). */
  def serve(spark: SparkSession, dataDir: String, path: String,
      queryStride: Long = 1L): DataFrame = {
    val appendedDir = new java.io.File(s"$path/appended_vectors.parquet")
    val extra =
      if (appendedDir.exists) Some(spark.read.parquet(appendedDir.getPath))
      else None
    SimilarityOps.ivfPqServe(spark, dataDir, queryStride,
      read(spark, dataDir, path), extra)
  }

  /** Incrementally index a batch of new vectors — the FAISS `add()`
    * semantics: assign each batch vector to its nearest STORED coarse
    * cell and PQ-encode its residual with the STORED codebook (no
    * retrain — the quantizer is frozen at build time, which is what
    * makes the operation an append instead of a rebuild), then append
    * the (vec_id, cell, codes) rows to `codes.parquet`. One broadcast
    * join pass over the batch; the base corpus is never touched. The
    * quantizer drifts from the data distribution as appends accumulate
    * — production systems rebuild when recall sags; [[read]]'s snapshot
    * gate is deliberately left on the BUILD corpus so a rebuild-vs-
    * append decision stays visible in `meta.json` (`appended` count). */
  def append(spark: SparkSession, dataDir: String, path: String,
      batch: DataFrame): Unit = {
    val idx = read(spark, dataDir, path)
    val encoded = SimilarityOps.encodeWithIndex(spark, batch, idx)
    // Write order is a crash-safety invariant: the FULL vectors land
    // FIRST, the ADC-rankable codes second. Codes serve the ranking, but
    // the exact rerank needs the vector — a crash between the two writes
    // must leave orphan VECTORS (harmless: nothing ranks them), never
    // orphan CODES (an ADC-ranked candidate the rerank cannot resolve is
    // dropped silently — the exact failure [[serve]]'s union exists to
    // prevent).
    batch.select(col("vec_id"), col("vec"))
      .write.mode("append").parquet(s"$path/appended_vectors.parquet")
    encoded.write.mode("append").parquet(s"$path/codes.parquet")
    val meta = java.nio.file.Files.readString(metaPath(path))
    val n = batch.count()
    val updated =
      if (meta.contains("\"appended\":"))
        """"appended":(\d+)""".r.replaceAllIn(meta,
          m => s""""appended":${m.group(1).toLong + n}""")
      else meta.patch(meta.lastIndexOf('}'), s""","appended":$n""", 0)
    java.nio.file.Files.writeString(metaPath(path), updated)
  }
}
