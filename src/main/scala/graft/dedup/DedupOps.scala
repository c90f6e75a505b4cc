package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for an LLM-training-data corpus (SURVEY.md
  * §2.C): exact hash dedup, MinHash+banded-LSH near-dup, SimHash
  * fingerprinting, and n-gram Jaccard pair similarity.
  *
  * Scale shape: every variant reduces pairwise O(n²) comparison to an
  * equi-join shuffle that is linear in corpus size — exact dedup groups on
  * a content hash; MinHash/SimHash group on (band, signature) buckets and
  * only verify within buckets; Jaccard candidates come from an inverted
  * index on (rare) shingles. No driver-side collection anywhere.
  */
object DedupOps {

  /** Word-shingle column: distinct n-word shingles of `text`. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(expr(
      s"""transform(
         |  sequence(1, greatest(size(split(trim(text), '\\\\s+')) - ${n - 1}, 1)),
         |  i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i, $n)))""".stripMargin))

  /** MinHash signature: for each of `k` hash families, the minimum of
    * xxhash64(seed, shingle) over the doc's shingle set. One narrow map. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Banded-LSH candidate pairs: split the k-wide signature into bands of
    * `rowsPerBand`, bucket on (band index, band slice hash), self-join
    * buckets. Returns candidate (doc_a, doc_b) pairs with doc_a < doc_b.
    * The shuffle key is the band bucket — linear in corpus size. */
  def lshCandidates(docs: DataFrame, idCol: String, sigCol: String, rowsPerBand: Int): DataFrame = {
    val nBands = 16 // caller sizes k = nBands * rowsPerBand
    val banded = docs.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> hash(slice($sigCol, b * $rowsPerBand + 1, $rowsPerBand), b))"))
        .as(Seq("band", "bucket"))
    )
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns as
    * integer counts — callers compare `2 * inter >= union` etc. so no
    * float division is involved. */
  def jaccardCounts(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    (inter, union)
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by each
    * token's xxhash64 bit, sign → bit. Pure column algebra. */
  def simhash64(tokens: Column): Column = {
    // bit i of the simhash = 1 iff sum over tokens of (bit i of h(tok) ? 1 : -1) > 0
    val bits = (0 until 64).map { i =>
      val vote = aggregate(
        tokens,
        lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      )
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  // ---- driver-contract queries over the documents table ----

  /** Exact dedup with planted duplicates: every 10th doc is re-keyed and
    * unioned back in, then collapsed by content hash keeping the lowest id.
    * Groups on xxhash64(text) so the shuffle carries an 8-byte key, not the
    * full text. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(planted)
      .groupBy(xxhash64(col("text")).as("__h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).cast("long").as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  /** Near-dup candidate pairs via MinHash + banded LSH (16 bands x 4 rows),
    * verified with exact shingle-Jaccard >= 0.5. Rows-only contract (the
    * minhash seeds are implementation detail); planted-dup recall is
    * asserted in DedupSpec. */
  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 64))
    val cands = lshCandidates(docs, "doc_id", "sig", 4)
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val (inter, union) = jaccardCounts(col("sh_a"), col("sh_b"))
    cands
      .join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter_n", inter.cast("long"))
      .withColumn("union_n", union.cast("long"))
      .filter(col("inter_n") * 2 >= col("union_n"))
      .select("doc_a", "doc_b", "inter_n", "union_n")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit fingerprints bucketed by 4 x 16-bit bands
    * (any pair within hamming distance 3 shares at least one band), then
    * exact hamming <= 3 verification via bit_count(xor). Rows-only. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(split(trim(lower(col("text"))), "\\s+")).as("sh"))
    val banded = docs.select(
      col("doc_id"), col("sh"),
      posexplode(expr("transform(sequence(0,3), b -> (sh >> (b*16)) & 65535)"))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram (3-word shingle) Jaccard pairs >= 0.5, exact semantics: the
    * candidate set (pairs sharing >= 1 shingle via an inverted-index join)
    * provably contains every pair with Jaccard > 0, so the result equals
    * brute-force O(n^2) comparison while shuffling only the index. */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    val index = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val cands = index.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(index.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val (inter, union) = jaccardCounts(col("sh_a"), col("sh_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter_n", inter.cast("long"))
      .withColumn("union_n", union.cast("long"))
      .filter(col("inter_n") * 2 >= col("union_n"))
      .select("doc_a", "doc_b", "inter_n", "union_n")
      .orderBy("doc_a", "doc_b")
  }
}
