package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for an LLM-training-data pipeline (SURVEY.md
  * §2.D): token counting, quality scoring, language ID, document
  * fingerprinting, corpus n-gram frequency, PII scrub, stratified
  * sampling, and the corpus-level quality cuts (repetition, boilerplate
  * spans, benchmark contamination, rare-word ratio).
  *
  * Everything is `functions._` column algebra (split / regexp /
  * higher-order array functions) — no UDFs. The per-doc ops are narrow
  * maps; the corpus-level ops shuffle once on the token/span key (count
  * aggregation or count-over-window) plus once on the doc — always
  * single-branch plans so the interpreted shingle HOFs evaluate once.
  *
  * Float policy: ratios are emitted as integer basis points
  * (`round(a * 10000.0 / b)` — same operation order as the oracle) because
  * engine-side rounding of doubles at scale > 0 is not portable.
  */
object TextOps {

  /** Whitespace tokens of a text column — the native codegen'd
    * [[graft.functions.WsTokenizeExpr]] byte-scan kernel (the regex
    * `split(trim(c), "\\s+")` pays the java.util.regex engine plus a
    * String round-trip per row across ~15 text entries, and its
    * JIT-sensitivity was the suite's main bench-variance source;
    * [[wsTokensAlgebra]] keeps the regex form as the differential
    * oracle TextOpsSpec pins bit-identical). */
  def wsTokens(c: Column): Column = graft.functions.GraftFunctions.wsTokenize(c)

  /** Regex reference form of [[wsTokens]] — the differential oracle. */
  private[graft] def wsTokensAlgebra(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace-token COUNT — `size(wsTokens(c)).cast("long")` as one
    * zero-allocation codegen'd byte scan ([[graft.functions.WsTokenCountExpr]]);
    * for the entries that only need `n_tokens`, the token array itself
    * is pure GC pressure. */
  def wsTokenCount(c: Column): Column = graft.functions.GraftFunctions.wsTokenCount(c)

  /** BPE-ish lexical tokens: word runs or single non-space symbols. */
  val BpePattern = "\\w+|[^\\w\\s]"

  /** Stopword lists per language for the heuristic lang-ID / quality ops.
    * Disjoint marker sets so argmax is unambiguous. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "que", "una", "por", "con"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有")
  )

  /** Count of tokens that fall in `words` — the native codegen'd
    * [[graft.functions.StopwordHits]] kernel (an interpreted HOF
    * `filter(tokens, array_contains)` breaks whole-stage codegen;
    * [[hitCountAlgebra]] keeps that form as the differential oracle). */
  private def hitCount(tokens: Column, words: Seq[String]): Column =
    graft.functions.GraftFunctions.stopwordHits(tokens, words)

  /** Column-algebra reference form of [[hitCount]] — the differential
    * oracle TextOpsSpec asserts bit-identical against the native
    * expression. */
  private[graft] def hitCountAlgebra(tokens: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens, t => array_contains(arr, t)))
  }

  // ---- driver-contract queries over the documents table ----

  /** Token counting: whitespace tokens + BPE-ish regex tokens per doc. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        wsTokenCount(col("text")).as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(text, '${BpePattern.replace("\\", "\\\\")}', 0)"))
          .cast("long").as("n_bpe_tokens")
      )
      .orderBy("doc_id")

  /** Quality scoring: length, token stats, punctuation / stopword /
    * alpha ratios as integer basis points (exact cross-engine hashing). */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nToks = size(toks).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[\\w\\s]", "")).cast("double")
    val nStop = hitCount(toks, Stopwords("en")).cast("double")
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        round(nChars * 10000.0 / nToks).cast("long").as("chars_per_token_bp"),
        round(nPunct * 10000.0 / nChars).cast("long").as("punct_ratio_bp"),
        round(nStop * 10000.0 / nToks).cast("long").as("stopword_ratio_bp")
      )
      .orderBy("doc_id")
  }

  /** The frozen quality-classifier model artifact (VERDICT r11 ask #5 —
    * the fastText-style linear scorer of GPT-3/LLaMA-lineage pipelines;
    * DSIR covers distribution matching, this is the SUPERVISED quality
    * stage): integer weights over word unigrams AND word bigrams
    * (fastText `wordNgrams=2`), applied through the hashing trick — a
    * feature scores by its md5-64 bucket, never by a vocabulary lookup.
    * A planted literal (the [[BpeMerges]] convention: encode applies a
    * TRAIN-time artifact, so both engines share it verbatim). Spam
    * markers carry large negative weight, prose connectives large
    * positive, and `the` a small positive so BASE-corpus text
    * participates in scoring (not only the planted suffixes). */
  private[graft] val QualityModel: Seq[(String, Long)] = Seq(
    "click" -> -1000000L, "buy" -> -900000L, "free" -> -950000L,
    "offer" -> -850000L, "subscribe" -> -800000L,
    "click here" -> -1500000L, "buy now" -> -1400000L,
    "because" -> 900000L, "therefore" -> 950000L, "with" -> 750000L,
    "of" -> 700000L, "and" -> 650000L,
    "because therefore" -> 1100000L, "of the" -> 800000L,
    "the" -> 1000L)

  /** Hashed-feature bucket count — fastText's own 2M-bucket default
    * (2^21; power of two, so unsigned `mod` equals `& (B-1)` on the
    * signed md5-64 long — the exact bit identity the DuckDB oracle's
    * `::UBIGINT % 2097152` replays). At 2^21 buckets a ~1k-type corpus
    * vocabulary has near-zero planted-bucket collisions, so the planted
    * class margins stay model-scale; colliding weights would still SUM
    * per bucket (fastText's shared-bucket behavior), identically in
    * both engines. */
  private[graft] val QualityBuckets = 2097152L

  /** The model's bucketed weight rows: md5-64 bucket → summed weight
    * (colliding planted terms SUM per bucket, fastText's shared-bucket
    * behavior). */
  private def qualityWeightRows: Seq[(Long, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    QualityModel
      .map { case (t, w) =>
        (graft.functions.Md5Hash64Array.hash64(UTF8String.fromString(t))
          & (QualityBuckets - 1L), w)
      }
      .groupBy(_._1).map { case (b, ws) => (b, ws.map(_._2).sum) }.toSeq
  }

  /** Planted-quality text + hashed unigram/bigram feature array for a
    * (doc_id, text) frame — shared by the batch classifier and the
    * streaming filter so both score the IDENTICAL feature stream. */
  private def qualityFeatures(docs: DataFrame): DataFrame = {
    val suffixed = docs
      .select(col("doc_id"), concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit(" click here buy now subscribe free offer"))
          .when(pmod(col("doc_id"), lit(5)) === 1,
            lit(" because therefore of the and with"))
          .otherwise(lit(""))).as("t"))
    suffixed.select(col("doc_id"),
      wsTokens(col("t")).as("ws"))
      .select(col("doc_id"), concat(col("ws"),
        zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("fs"))
  }

  /** fastText-style quality-classifier scoring — the canonical
    * supervised quality-filter stage: every document scores as the sum
    * of planted integer weights over its hashed unigram+bigram
    * features, and `label` is the keep/drop release decision
    * (`logit_sum > 0`). High/low-quality spans are PLANTED by doc_id
    * arithmetic (the text_domain_stats convention — the synthetic
    * corpus carries no natural quality signal): docs ≡0 (mod 5) gain a
    * spam-marker suffix, ≡1 a prose-connective suffix, the rest score
    * on base text alone (where only `the` carries weight).
    *
    * The HASHING TRICK is the load-bearing scale property (Joulin et
    * al. 2016): scoring needs no vocabulary build and no corpus-sized
    * model join — features map to a FIXED 2^21-bucket weight table
    * (weights of colliding planted terms SUM per bucket, exactly
    * fastText's shared-bucket behavior), the table broadcasts, and the
    * plan is one narrow codegen'd map (tokens → md5-64 → `& 4095`,
    * the [[graft.functions.Md5Hash64Array]] kernel) + one broadcast
    * left join + one map-side-combined groupBy — scan-bound at any
    * corpus size, the fastText inference shape. Bigrams build inside
    * the row via zip_with on the token array (no shuffle, no window).
    * TextOpsSpec proves the planted classes separate with a wide
    * margin; the oracle replays weights, hashing, and labels
    * integer-exactly. */
  def qQualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityLogits(spark,
      Tables.spread(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("n_features"), col("n_hits"), col("logit_sum"),
        when(col("logit_sum") > 0, "keep").otherwise("drop").as("label"))
      .orderBy("doc_id")

  /** [[qQualityClassifier]]'s scoring kernel over an explicit (doc_id,
    * text) frame — factored so the end-to-end pipeline ledger
    * ([[pipelineLedger]]) scores the same feature stream on a filtered
    * corpus. Returns (doc_id, n_features, n_hits, logit_sum). */
  private[graft] def qualityLogits(spark: SparkSession, docs: DataFrame): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val weights = qualityWeightRows.toDF("b", "wt")
    qualityFeatures(docs.select("doc_id", "text"))
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.md5Hash64Array(col("fs"))).as("h"))
      .withColumn("b", col("h").bitwiseAND(lit(QualityBuckets - 1L)))
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        sum(when(col("wt").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(coalesce(col("wt"), lit(0L))).as("logit_sum"))
  }

  /** The SHUFFLE-FREE form of the quality scorer — streaming inference
    * shape: the bucketed weight table rides the plan as a LITERAL map
    * (viable for the planted 15-term model; a production 2M-bucket
    * table takes the batch entry's broadcast-join form instead, which is
    * ALSO stream-legal as a stream-static join — what is not is the
    * explode+groupBy re-aggregation, so here the per-doc sum happens
    * INSIDE the row via codegen'd higher-order functions over the
    * feature array: no explode, no shuffle, no state). Stateless per-row
    * ⇒ appends through a file stream with no watermark; each
    * micro-batch scores its documents independently. Emits only the
    * kept documents — the filter stage a streaming ingestion pipeline
    * runs before landing training data. */
  private[graft] def qualityFilterScored(docs: DataFrame): DataFrame = {
    val wmap = map(qualityWeightRows
      .flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
    val scored = qualityFeatures(docs)
      .select(col("doc_id"),
        transform(graft.functions.GraftFunctions.md5Hash64Array(col("fs")),
          h => h.bitwiseAND(lit(QualityBuckets - 1L))).as("bs"))
      .select(col("doc_id"),
        size(col("bs")).cast("long").as("n_features"),
        aggregate(col("bs"), lit(0L),
          (acc, b) => acc + coalesce(element_at(wmap, b), lit(0L)))
          .as("logit_sum"))
    // the keep-filter is a TYPED filter on purpose — a pushdown BARRIER:
    // a Catalyst `col("logit_sum") > 0` predicate here is deterministic,
    // so the optimizer substitutes the alias and pushes it below the
    // scoring projection, re-evaluating the whole tokenize→hash→
    // aggregate chain TWICE per row (once in the pushed Filter, once in
    // the Project — verified via explain: 2x scan CPU at any corpus
    // size). The object filter deserializes three primitives per
    // already-scored row instead — bounded constant, stream-legal, and
    // the expensive chain stays evaluated exactly once.
    val spark2 = docs.sparkSession
    import spark2.implicits._
    scored.as[(Long, Long, Long)].filter(_._3 > 0L).toDF()
  }

  /** Sliding-window document chunking — the stage that turns variable-
    * length documents into model-sized pieces (pretraining context
    * windows, RAG passage stores): W=32-token windows at stride S=24
    * (8-token overlap so no boundary sentence is lost to a cut; the
    * synthetic docs cap at ~100 tokens, so these dials make every doc
    * genuinely multi-chunk — production dials are one constant away), a
    * final short window flush at the tail, and an integer fingerprint
    * per chunk (sum of the tokens' md5-64 >>> 20 — chunk-level identity
    * for downstream chunk dedup, replayed exactly by the oracle).
    * Chunk count = 1 + ceil(max(n−W, 0)/S), so every token is covered
    * and the last window is the one containing the end.
    *
    * Scale shape: pure per-row arithmetic — tokens hash once per doc,
    * the chunk index list is a cheap `sequence`, and each chunk row
    * slices the carried hash array (worst-case ~W/S× row blowup, no
    * shuffle, no window function). At 100 TB this is exactly the
    * embarrassingly parallel map a chunker must be. */
  def qTextChunkWindows(spark: SparkSession, dir: String): DataFrame = {
    val W = 32L
    val S = 24L
    val base = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      .select(col("doc_id"),
        transform(graft.functions.GraftFunctions.md5Hash64Array(col("ws")),
          h => shiftrightunsigned(h, 20)).as("hs"),
        size(col("ws")).cast("long").as("n"))
      .withColumn("n_chunks",
        lit(1L) + ceil(greatest(col("n") - W, lit(0L)) / S.toDouble).cast("long"))
    base
      .select(col("doc_id"), col("hs"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * S).as("start_tok"),
        least(lit(W), col("n") - col("chunk_idx") * S).as("n_tokens"),
        aggregate(
          slice(col("hs"), (col("chunk_idx") * S + 1L).cast("int"),
            least(lit(W), col("n") - col("chunk_idx") * S).cast("int")),
          lit(0L), (acc, h) => acc + h).as("fingerprint"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Chunk-level exact dedup — the passage-dedup stage run AFTER
    * chunking (RefinedWeb-lineage pipelines dedupe at passage
    * granularity precisely because document-level dedup misses the
    * boilerplate spans repeated ACROSS distinct documents; the sf
    * corpus carries ~3% naturally repeated windows, so this gate is
    * non-vacuous with no planting): each W=32/S=24 window keys by the
    * md5-64 of its token string (positional — the chunker's sum
    * fingerprint is order-insensitive and deliberately NOT the dedup
    * key), first occurrence in (doc_id, chunk_idx) order is the
    * representative, later occurrences mark `drop_dup` with their rep
    * identity. One shuffle by content key (the canonical dedup
    * shuffle), bounded per-key state — linear at any corpus size. */
  def qTextChunkDedup(spark: SparkSession, dir: String): DataFrame =
    chunkDecisions(Tables.spread(spark, Tables.documents(spark, dir)))
      .orderBy("doc_id", "chunk_idx")

  /** The unsorted chunk-decision frame shared by [[qTextChunkDedup]] (which
    * presents it ordered) and [[qTextChunkDocPurge]] (which aggregates it —
    * factored so the purge groupBy doesn't ride a pointless global sort).
    * Takes the docs frame directly so specs can plant corpora. */
  def chunkDecisions(docs: DataFrame): DataFrame =
    chunkDecisionsFull(docs).drop("n_tokens")

  /** [[chunkDecisions]] plus the window's token count — the ONE site of
    * the rep-election rule (first (doc_id, chunk_idx) per chunk_key),
    * so the dedup entry, the doc purge, and the chunk pack can never
    * drift apart on it. */
  private[graft] def chunkDecisionsFull(docs: DataFrame): DataFrame = {
    val keyed = chunkKeys(docs)
    val w = Window.partitionBy("chunk_key").orderBy("doc_id", "chunk_idx")
    keyed
      .withColumn("rep_doc", first(col("doc_id")).over(w))
      .withColumn("rep_chunk", first(col("chunk_idx")).over(w))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_key"),
        when(col("doc_id") === col("rep_doc") &&
          col("chunk_idx") === col("rep_chunk"), "keep")
          .otherwise("drop_dup").as("decision"),
        col("rep_doc"), col("rep_chunk"), col("n_tokens"))
  }

  /** The stateless chunker → content-key map shared by the batch dedup
    * family ([[chunkDecisions]]) and the STREAMING passage-identity
    * filter ([[graft.streaming.EventStreams.qStreamChunkDedup]]):
    * per doc, W=32/S=24 windows keyed by the positional md5-64 of the
    * window's token string, plus the window's token count (a pure
    * function of the key — equal keys imply equal texts imply equal
    * counts, which is what makes the streamed distinct-key output
    * value-identical no matter which occurrence survives). Per-row
    * explode, no shuffle — stream-legal with no state. */
  private[graft] def chunkKeys(docs: DataFrame): DataFrame = {
    val W = 32L
    val S = 24L
    docs
      .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("n"))
      .withColumn("n_chunks",
        lit(1L) + ceil(greatest(col("n") - W, lit(0L)) / S.toDouble).cast("long"))
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        shiftrightunsigned(graft.dedup.DedupOps.md5Hash64(
          concat_ws(" ", slice(col("ws"),
            (col("chunk_idx") * S + 1L).cast("int"),
            least(lit(W), col("n") - col("chunk_idx") * S).cast("int")))), 1)
          .as("chunk_key"),
        least(lit(W), col("n") - col("chunk_idx") * S).as("n_tokens"))
  }

  /** Chunk-granularity sequence packing — the stage RefinedWeb-lineage
    * pipelines actually run after passage dedup (documents were chunked
    * precisely so the SURVIVING passages, not whole documents, fill the
    * training context windows): elect each chunk-key's representative
    * (the [[chunkDecisions]] rule), keep only representatives, and pack
    * them into 2048-token sequences in global (doc_id, chunk_idx) order
    * via the distributed prefix sum ([[packUnits]] — id-range buckets
    * preserve the order because chunk_idx nests inside doc_id). Emits
    * the same manifest columns as `text_pack_sequences`, keyed at chunk
    * granularity. Scale: the chunker's explode + ONE chunk-key shuffle
    * (the dedup election) + the prefix-sum pack — all linear; no global
    * single-partition window. */
  def qTextChunkPack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = chunkDecisionsFull(Tables.spread(spark, docs))
      .filter(col("decision") === "keep")
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
    // range-bucket bound from the raw scan (metadata), so the chunker +
    // election plan executes once, not twice (see packUnits)
    val maxRawId = docs.agg(max("doc_id")).head().getLong(0)
    packUnits(spark, kept, orderCols = Seq("doc_id", "chunk_idx"),
      maxIdHint = Some(maxRawId))
      .select("doc_id", "chunk_idx", "n_tokens", "token_start",
        "seq_first", "seq_last", "seq_offset")
      .orderBy("doc_id", "chunk_idx")
  }

  /** Document purge over chunk-dup mass — the RefinedWeb-lineage removal
    * criterion at DOC granularity: after passage dedup elects corpus-wide
    * representatives, a document whose content is MOSTLY chunks owned
    * elsewhere carries almost no novel text and is purged whole (keeping
    * it would re-train on the duplicated mass the chunk pass already
    * charged to its representatives). Tiers: `drop_doc` when duplicated
    * chunks are a strict majority (2·dup > total — integer arithmetic,
    * no float ratio to round), `partial_dup` when some-but-minority
    * chunks are duplicated (the doc survives but its dup mass is
    * reportable), `keep_clean` otherwise. All three tiers carry natural
    * traffic at every test SF (~13 drop / ~5 partial / ~480 clean — no
    * planting; measured via the oracle replay). Scale shape: the chunk
    * shuffle [[chunkDecisions]] already pays, plus ONE doc_id groupBy —
    * map-side combinable, linear at any corpus size. */
  def qTextChunkDocPurge(spark: SparkSession, dir: String): DataFrame =
    chunkDecisions(Tables.spread(spark, Tables.documents(spark, dir)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("decision") === "drop_dup", 1L).otherwise(0L))
          .cast("long").as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        when(col("n_dup_chunks") * 2 > col("n_chunks"), "drop_doc")
          .when(col("n_dup_chunks") > 0, "partial_dup")
          .otherwise("keep_clean").as("decision"))
      .orderBy("doc_id")

  /** Chunk-level NEAR-dup pairs — the approximate twin of
    * [[qTextChunkDedup]] (exact keys miss a one-word edit; RefinedWeb-
    * lineage pipelines near-dedup passages for exactly that): each
    * W=32/S=24 window shingles into distinct 3-gram hashes, takes a
    * 64-wide MinHash signature, and routes through 16×4 banded LSH
    * (the [[graft.dedup.DedupOps]] kernels — one fused codegen pass
    * each); candidates verify with the exact sorted-merge Jaccard at
    * J ≥ 0.8 (5·inter ≥ 4·union, integer arithmetic). The corpus's
    * chunk-pair Jaccard distribution has an empty moat between <0.3
    * (stride-overlap siblings of the SAME doc, J≈0.11) and ≥0.8, and
    * 16×4 banding recall at J=0.8 is 1−(1−0.8⁴)¹⁶ ≈ 0.9998 — so the
    * oracle (the full EXACT J≥0.8 pair list) doubles as an LSH recall
    * gate, the dedup_minhash_lsh convention. Sub-shingle-width tails
    * (<3 tokens) carry no 3-gram signal and sit out on both engines.
    * Chunk identity packs as doc_id·2²⁰+chunk_idx so the pair kernels
    * key on one long; unpacked by shift/mask on output. Scale shape:
    * the LSH bucket join is the only shuffle that grows with the
    * corpus — linear, never all-pairs. */
  def qTextChunkMinhash(spark: SparkSession, dir: String): DataFrame = {
    val W = 32L
    val S = 24L
    val CB = 20 // chunk_idx bits in the packed chunk id
    val base = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("n"))
      .withColumn("n_chunks",
        lit(1L) + ceil(greatest(col("n") - W, lit(0L)) / S.toDouble).cast("long"))
    val chunks = base
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        (shiftleft(col("doc_id"), CB) + col("chunk_idx")).as("cid"),
        graft.dedup.DedupOps.shingleHashes(
          slice(col("ws"), (col("chunk_idx") * S + 1L).cast("int"),
            least(lit(W), col("n") - col("chunk_idx") * S).cast("int")), 3)
          .as("sh"))
      .filter(size(col("sh")) >= 1)
      .withColumn("sig", graft.dedup.DedupOps.minhashSignature(col("sh"), 64))
    val cands = graft.dedup.DedupOps.lshCandidates(chunks, "cid", "sig", 4)
    val a = chunks.select(col("cid").as("doc_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("cid").as("doc_b"), col("sh").as("sh_b"))
    val (inter, union) = graft.dedup.DedupOps.jaccardCounts(col("sh_a"), col("sh_b"))
    cands
      .join(a, "doc_a").join(b, "doc_b")
      .filter(inter * 5 >= union * 4)
      .withColumn("inter_n", inter.cast("long"))
      .withColumn("union_n", union.cast("long"))
      .select(
        shiftrightunsigned(col("doc_a"), CB).as("doc_a2"),
        col("doc_a").bitwiseAND((1L << CB) - 1).as("chunk_a"),
        shiftrightunsigned(col("doc_b"), CB).as("doc_b2"),
        col("doc_b").bitwiseAND((1L << CB) - 1).as("chunk_b"),
        col("inter_n"), col("union_n"))
      .withColumnRenamed("doc_a2", "doc_a").withColumnRenamed("doc_b2", "doc_b")
      .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
  }

  /** Data-mixture reweighting — the domain-balancing step of a training
    * pipeline (keep one crawl from dominating the mix): per-source token
    * mass vs the uniform target share, emitting the keep-rate each
    * source needs. Over-represented sources get `keep_rate_ppm =
    * target/actual`; under-represented sources cap at 1.0 (never
    * upsample). Integer ppm / floor-division arithmetic end-to-end so
    * the DuckDB oracle reproduces every value exactly.
    *
    * Scale shape: one map-side partial-agg `groupBy(source)` reduces
    * the corpus to a per-source frame; the global totals come back as a
    * broadcast scalar (the q11/q15 broadcast-scalar pattern) — no
    * window over the corpus and no driver collect. */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("source"), wsTokenCount(col("text")).as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
    val totals = perSource.agg(
      sum("n_tokens").as("total_tokens"), count(lit(1)).as("n_sources"))
    perSource.join(broadcast(totals), lit(true))
      .withColumn("target_tokens", expr("total_tokens div n_sources"))
      // floor(t*1e6/n) WITHOUT the t*1e6 intermediate (which overflows
      // Long past ~9.2e12 tokens — and Spark wraps silently where DuckDB
      // errors): split 1e6 = 1000*1000 and carry the exact remainder,
      //   floor(t*1e6/n) = q1*1000 + floor((r1*1000)/n),
      //   q1 = (t*1000) div n, r1 = (t*1000) mod n  (< n)
      // — exact for t, n up to ~9.2e15 tokens (~36 PB of text)
      .withColumn("keep_rate_ppm",
        least(lit(1000000L), expr(
          "(target_tokens * 1000 div n_tokens) * 1000" +
            " + ((target_tokens * 1000 % n_tokens) * 1000) div n_tokens")))
      // same trick for floor(n*rate/1e6): rate <= 1e6, so split n instead
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("keep_rate_ppm"),
        expr("(n_tokens div 1000000) * keep_rate_ppm" +
          " + ((n_tokens % 1000000) * keep_rate_ppm) div 1000000")
          .as("expected_tokens"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture — the OTHER canonical mixing rule
    * ([[qDomainMix]] targets uniform shares; GPT/XLM-lineage pipelines
    * target shares ∝ mass^τ, flattening the head without erasing it).
    * τ = 1/2, deliberately: `sqrt` is IEEE-correctly-rounded in BOTH
    * engines and an integer's root is never within half-an-ulp of a
    * wrong integer at these magnitudes, so `floor(sqrt(n_tokens))`
    * gives a cross-engine-exact INTEGER weight and every downstream
    * value stays in exact long arithmetic (a general-τ `pow` is libm-
    * dependent and not replayable). Per source: weight w = isqrt(mass),
    * target = floor(total·w/Σw) (overflow-split: total = q·Σw + r ⇒
    * q·w + floor(r·w/Σw), exact past 100 TB), keep-rate capped at 1.0 —
    * single-epoch projection; true temperature sampling UPSAMPLES small
    * sources across epochs, which is a repeat count, not a filter rate.
    * Same scale shape as [[qDomainMix]]: one map-side groupBy(source) +
    * a broadcast totals scalar. */
  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("source"), wsTokenCount(col("text")).as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .withColumn("sqrt_w", floor(sqrt(col("n_tokens"))).cast("long"))
    val totals = perSource.agg(
      sum("n_tokens").as("total_tokens"), sum("sqrt_w").as("w_sum"))
    perSource.join(broadcast(totals), lit(true))
      .withColumn("target_tokens", expr(
        "(total_tokens div w_sum) * sqrt_w" +
          " + ((total_tokens % w_sum) * sqrt_w) div w_sum"))
      .withColumn("keep_rate_ppm",
        least(lit(1000000L), expr(
          "(target_tokens * 1000 div n_tokens) * 1000" +
            " + ((target_tokens * 1000 % n_tokens) * 1000) div n_tokens")))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("sqrt_w"),
        col("target_tokens"), col("keep_rate_ppm"),
        expr("(n_tokens div 1000000) * keep_rate_ppm" +
          " + ((n_tokens % 1000000) * keep_rate_ppm) div 1000000")
          .as("expected_tokens"))
      .orderBy("source")
  }

  /** General-τ temperature mixing — [[qTemperatureMix]] is the τ = 1/2
    * special case (integer sqrt); this entry weights sources by
    * EXACT `floor(mass^τ)` for non-half τ via the rational-exponent
    * integer-root kernel [[graft.functions.IntegerPowRoot]]
    * (`w = floor((mass^p)^(1/q))` in BigInteger — no libm `pow`, no
    * platform-dependent floor boundaries, valid at any corpus
    * magnitude). Gated at τ = 3/10 and τ = 3/4: the DuckDB oracle
    * certifies each weight EXACTLY with a double-pow seed plus a
    * 128-bit integer power check (w^q ≤ mass^p < (w+1)^q), which fits
    * DuckDB's hugeint for p = 3 up to ~4.6e12 tokens per source —
    * τ = 7/10's certificate needs mass^7 (past 128 bits at any real
    * mass), so it is pinned in TextOpsSpec against an independent
    * BigInt replay instead of the SQL oracle; the ENGINE kernel is
    * exact for every rational τ either way. Downstream target/rate
    * arithmetic is the overflow-split integer convention shared with
    * [[qTemperatureMix]]. Same scale shape: one map-side
    * groupBy(source) + a broadcast totals scalar; the τ dimension is a
    * 2-row stack over metadata-cardinality rows. */
  def qTemperatureMixTau(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.intPowRoot
    val perSource = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("source"), wsTokenCount(col("text")).as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .withColumn("w310", intPowRoot(col("n_tokens"), 3, 10))
      .withColumn("w34", intPowRoot(col("n_tokens"), 3, 4))
    val totals = perSource.agg(
      sum("n_tokens").as("total_tokens"),
      sum("w310").as("ws310"), sum("w34").as("ws34"))
    perSource.join(broadcast(totals), lit(true))
      .selectExpr("source", "n_docs", "n_tokens", "total_tokens",
        """stack(2,
          |  cast(300000 as bigint), w310, ws310,
          |  cast(750000 as bigint), w34,  ws34) AS (tau_ppm, w, w_sum)""".stripMargin)
      .withColumn("target_tokens", expr(
        "(total_tokens div w_sum) * w + ((total_tokens % w_sum) * w) div w_sum"))
      .withColumn("keep_rate_ppm",
        least(lit(1000000L), expr(
          "(target_tokens * 1000 div n_tokens) * 1000" +
            " + ((target_tokens * 1000 % n_tokens) * 1000) div n_tokens")))
      .select(col("tau_ppm"), col("source"), col("n_docs"), col("n_tokens"),
        col("w"), col("target_tokens"), col("keep_rate_ppm"))
      .orderBy("tau_ppm", "source")
  }

  /** Epoch repeat plan — the UPSAMPLING half of temperature mixing that
    * [[qTemperatureMix]]'s capped keep-rate deliberately cannot express
    * (a filter rate can only shed): for each source, how to hit the
    * τ=1/2 target when it EXCEEDS the source's mass — repeat the whole
    * source `full_epochs = target div mass` times, then sample the
    * remainder at `rem_rate_ppm` on one more pass (the Dolma/LLaMA-
    * lineage epoch-mixing recipe). Identity: expected tokens =
    * full_epochs·mass + floor(mass·rem_rate/1e6) ≈ target (ppm floor
    * slack only), which the oracle replays exactly. Same
    * groupBy(source) + broadcast-scalar shape; the plan frame is
    * source-cardinality metadata at any corpus size. */
  def qEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("source"), wsTokenCount(col("text")).as("ntok"))
      .groupBy("source")
      .agg(sum("ntok").as("n_tokens"))
      .withColumn("sqrt_w", floor(sqrt(col("n_tokens"))).cast("long"))
    val totals = perSource.agg(
      sum("n_tokens").as("total_tokens"), sum("sqrt_w").as("w_sum"))
    perSource.join(broadcast(totals), lit(true))
      .withColumn("target_tokens", expr(
        "(total_tokens div w_sum) * sqrt_w" +
          " + ((total_tokens % w_sum) * sqrt_w) div w_sum"))
      .withColumn("full_epochs", expr("target_tokens div n_tokens"))
      // remainder rate in ppm, overflow-split like the mix entries
      .withColumn("rem_rate_ppm", expr(
        "((target_tokens % n_tokens) * 1000 div n_tokens) * 1000" +
          " + (((target_tokens % n_tokens) * 1000 % n_tokens) * 1000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        col("full_epochs"), col("rem_rate_ppm"),
        expr("full_epochs * n_tokens + (n_tokens div 1000000) * rem_rate_ppm" +
          " + ((n_tokens % 1000000) * rem_rate_ppm) div 1000000")
          .as("expected_tokens"))
      .orderBy("source")
  }

  /** Domain/URL-level corpus statistics — the CommonCrawl-shape rollup a
    * web-scale pipeline computes before domain weighting (`text_domain_mix`
    * consumes the mass shares; `q_pagerank` ranks the domain graph): URL
    * canonicalization (case-fold scheme+host, strip `www.`, drop the
    * https default port, drop fragments, drop `utm_*` tracking params)
    * and registrable-domain extraction (last two host labels, or three
    * under a multi-label public suffix like `co.uk`), then one rollup of
    * doc count, distinct canonical URLs, token mass, and exact-duplicate
    * share per domain.
    *
    * The documents table carries no URL column, so each doc's raw URL is
    * DERIVED deterministically from (doc_id, source) — the planted-twin
    * convention: mixed case, www/cdn subdomains, an explicit `:443`,
    * utm params and fragments all appear on arithmetic schedules, so the
    * canonicalizer's every rule is exercised and the DuckDB oracle
    * regenerates and re-parses the identical strings. Dup share counts
    * docs whose 63-bit content hash appears more than once corpus-wide
    * (the `dedup_decision` key convention), as integer ppm.
    *
    * Scale shape: URL derivation+parsing is per-row codegen'd string
    * algebra on the scan; dup marking is one count-over-window on the
    * 8-byte hash; the rollup is one map-side-combined groupBy(domain).
    * Nothing driver-side, no joins wider than the corpus. */
  def qDomainStats(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"), col("source"))
    // the corpus ships dup-free, so the dup-share path would be
    // vacuously zero: plant the dedup family's exact copies (every 10th
    // doc republished at +1e6 — same text, its own URL), the syndicated-
    // article shape domain dup-share exists to measure
    val docs = base.unionByName(base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
    val url = concat(lit("HTTPS://"),
      when(col("doc_id") % 4 === 0, lit("WWW."))
        .when(col("doc_id") % 4 === 1, lit("cdn.")).otherwise(lit("")),
      when(col("doc_id") % 6 === 0, upper(col("source"))).otherwise(col("source")),
      lit("."),
      when(col("doc_id") % 3 === 0, lit("co.uk"))
        .when(col("doc_id") % 3 === 1, lit("com")).otherwise(lit("org")),
      when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/articles/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 2 === 0, concat(
        lit("?utm_source=feed&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
        lit("&id="), (col("doc_id") % 20).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, concat(lit("#sec"), (col("doc_id") % 4).cast("string")))
        .otherwise(lit("")))
    val host = regexp_replace(
      lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1)), "^www\\.", "")
    val path = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]*(/[^?#]*)", 1)
    val kept = filter(split(regexp_extract(col("url"), "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val canon = concat(lit("https://"), col("host"), path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit("")))
    val labels = split(col("host"), "\\.")
    val domain = when(col("host").endsWith(".co.uk"),
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
    val perDoc = docs.withColumn("url", url)
      .withColumn("host", host)
      .select(col("doc_id"), col("text"), canon.as("canon"), domain.as("domain"),
        wsTokenCount(col("text")).as("n_tokens"),
        shiftrightunsigned(graft.functions.GraftFunctions
          .md5Hash64Array(array(col("text"))).getItem(0), 1).as("th"))
    val marked = perDoc.withColumn("__copies",
      count(lit(1)).over(Window.partitionBy("th")))
    marked.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_distinct_urls"),
        sum("n_tokens").as("token_mass"),
        sum(when(col("__copies") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_share_ppm", expr("dup_docs * 1000000 div n_docs"))
      .orderBy("domain")
  }

  /** Budget-constrained data selection — pick the highest-quality docs
    * until a token budget (10% of corpus tokens) is exhausted, the data-
    * mixing step that turns quality scores into an actual training set.
    *
    * Selection CONTRACT is the global greedy rule "order by (score desc,
    * doc_id), take while inclusive running token sum ≤ budget" — which
    * the DuckDB oracle evaluates literally with a window cumsum. The
    * IMPLEMENTATION never builds that global single-partition cumsum (a
    * total-order window is the q_percentiles scale-killer in disguise):
    * scores are already bounded integers (stopword-ratio basis points),
    * so phase 1 aggregates (token sum, doc count) per score — a ≤10001-
    * row collect — and the driver walks the histogram desc to find the
    * boundary score and its remaining budget; phase 2 selects score >
    * boundary entirely in-plan and runs the cumsum window ONLY inside
    * the boundary score's tiny partition. Equivalent by construction:
    * global-cum(doc) ≤ budget ⟺ bucket-local-cum(doc) ≤ remaining. */
  def qBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    // (doc_id, score, ntok) is tiny and feeds THREE consumers (histogram
    // + both selection branches) — session-cache it so the interpreted
    // token pipeline runs once, not per branch
    val docs = graft.SessionCache.cachedDirView(
      spark, "graft_budget_docs", dir) {
      Tables.spread(spark, Tables.documents(spark, dir)).select(
        col("doc_id"),
        round(hitCount(toks, Stopwords("en")).cast("double") * 10000.0 /
          size(toks).cast("double")).cast("long").as("score_bp"),
        size(toks).cast("long").as("n_tokens"))
    }
    val hist = docs.groupBy(col("score_bp"))
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val budget = hist.map(_._2).sum / 10
    var cumBefore = 0L
    var boundary = Long.MinValue
    var remaining = 0L
    val it = hist.iterator
    var found = false
    while (it.hasNext && !found) {
      val (score, t) = it.next()
      if (cumBefore + t > budget) { boundary = score; remaining = budget - cumBefore; found = true }
      else cumBefore += t
    }
    val selected =
      if (!found) docs // whole corpus fits the budget
      else {
        val above = docs.filter(col("score_bp") > boundary)
        val atBoundary = docs.filter(col("score_bp") === boundary)
          .withColumn("__cum", sum("n_tokens").over(
            Window.partitionBy("score_bp").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
        above.unionByName(atBoundary)
      }
    selected.select("doc_id", "score_bp", "n_tokens").orderBy("doc_id")
  }

  /** Heuristic language ID: argmax of per-language stopword hits, ties and
    * zero-hit docs → "und". Deterministic tie policy: highest count wins,
    * first language in (en, de, fr, es, zh) order on equal counts. */
  def qLangId(spark: SparkSession, dir: String): DataFrame =
    withLangPred(Tables.spread(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("top_hits"))
      .orderBy("doc_id")

  /** [[qLangId]]'s prediction kernel: appends (pred_lang, top_hits) to
    * any frame carrying `text` — per-row stopword argmax, no shuffle.
    * Factored so the end-to-end pipeline's language gate
    * ([[pipelineLedger]]) is the registered lang-ID entry verbatim. */
  private[graft] def withLangPred(docs: DataFrame): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val langs = Seq("en", "de", "fr", "es", "zh")
    val hits = langs.map(l => hitCount(toks, Stopwords(l)).as(s"__hits_$l"))
    val withHits = docs.select(col("*") +: hits: _*)
    val best = langs.map(l => col(s"__hits_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"__hits_$l") === col("__best") && col("__best") > 0, lit(l)).otherwise(acc)
    }
    withHits
      .withColumn("__best", best)
      .withColumn("pred_lang", pred)
      .withColumn("top_hits", col("__best").cast("long"))
      .drop(langs.map(l => s"__hits_$l") :+ "__best": _*)
  }

  /** Rolling-hash document fingerprint: polynomial hash over the
    * code-point stream, mod 1e9+7 (stays in exact long range at every
    * step). Per-row, no shuffle — the native codegen'd
    * [[graft.functions.RollingHashFp]] kernel;
    * [[docFingerprintAlgebra]] keeps the HOF fold as its
    * differential-test oracle. */
  def qDocFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.rollingHashFp(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Column-algebra reference implementation of the fingerprint fold —
    * two per-row arrays plus an interpreted per-character fold; kept as
    * the differential-test oracle for the native expression
    * (TextOpsSpec asserts bit-identical output). */
  private[graft] def docFingerprintAlgebra(text: Column): Column =
    expr(
      """aggregate(
        |  transform(split(text, ''), c -> ascii(c)),
        |  cast(0 as bigint),
        |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin)

  /** PII scrubbing — standard training-data redaction pass: emails, then
    * URLs, then long digit runs (phone/account numbers), replaced with
    * typed placeholder tokens. Order matters (emails before bare domains).
    * Pure regexp_replace chain — codegen'd, one narrow map. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "\\d{7,}", "<NUM>")
  }

  /** Scrub demo over documents with synthetic PII planted per doc (the
    * corpus itself is clean), so all three redaction classes execute. */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .withColumn("dirty",
        concat(col("text"), lit(" contact bob"), col("doc_id"), lit("@mail.example.com"),
          lit(" visit https://ex.example/x"), col("doc_id"),
          lit(" acct "), (col("doc_id") + 10000000L)))
      .select(col("doc_id"), scrubPii(col("dirty")).as("clean"),
        (length(col("dirty")) - length(scrubPii(col("dirty")))).cast("long").as("n_chars_redacted"))
      .orderBy("doc_id")

  /** Bigram array of a pre-split words column. Docs with fewer than two
    * tokens yield null (NOT a descending sequence(1, 0), which would make
    * slice() throw at runtime) — callers explode_outer and null-filter,
    * matching an oracle's empty range(1, len). */
  def bigrams(words: Column): Column =
    when(size(words) >= 2, transform(
      sequence(lit(1), size(words) - 1),
      i => concat_ws(" ", slice(words, i, lit(2)))))

  /** Corpus bigram frequency: per-doc bigrams via an index-sequence
    * transform, explode, global count. Top-100 with deterministic order. */
  def qNgramFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(wsTokens(col("text")).as("words")) // split once per row
      // explode_outer + null filter: plain explode gets an inferred
      // size(...)>0 pre-filter that re-evaluates the bigram transform
      .select(explode_outer(bigrams(col("words"))).as("bigram"))
      .filter(col("bigram").isNotNull)
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(100)

  /** Deterministic stratified downsampling — the reproducible-corpus-cut
    * every training-data pipeline needs: the keep decision is a pure
    * function of the document id (bits 8..14 of the engine-portable
    * [[graft.functions.Md5Hash64Array]] id hash → a stable 0..127 bucket),
    * with a per-language keep threshold (minority languages kept at a
    * higher rate — the usual rebalancing move). No RNG, no state: re-runs,
    * retries, and other engines (the DuckDB oracle recomputes the same
    * buckets from md5) all select the identical subset, and the filter is
    * a narrow codegen'd map — no shuffle at any corpus size. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.GraftFunctions
      .md5Hash64Array(array(col("doc_id").cast("string")))
      .getItem(0)
    val keepBelow = when(col("lang") === "en", lit(32)).otherwise(lit(64))
    // no spread here: the keep-decision is a cheap filter that belongs at
    // the scan — repartitioning rows that are about to be dropped is the
    // anti-pattern Tables.spread warns about
    Tables.documents(spark, dir)
      .withColumn("bucket", shiftrightunsigned(bucket, 8).bitwiseAND(lit(127L)))
      .filter(col("bucket") < keepBelow)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Distributed weighted sampling WITHOUT replacement — Efraimidis &
    * Spirakis A-ES ("Weighted random sampling with a reservoir", IPL
    * 2006): each row gets key u^(1/w) for uniform u, and the k largest
    * keys ARE a weight-proportional sample without replacement. Ordering
    * by u^(1/w) equals ordering by ln(u)/w, which is what's computed
    * (one log instead of a pow).
    *
    * The uniform is deterministic and engine-portable, same contract as
    * [[qStratifiedSample]]: the [[graft.functions.Md5Hash64Array]] id
    * hash's top 53 bits map to u ∈ (0, 1] via exact power-of-two
    * arithmetic (`(h >>> 11) + 1) / 2^53` — every step reproducible
    * bit-for-bit in DuckDB from md5). Weights are the document token
    * mass (`n_chars`) — "sample proportional to length" is the standard
    * budget-shaped corpus cut.
    *
    * Scale shape: the plan is one narrow map (hash + log per row) into
    * TakeOrderedAndProject — per-partition bounded top-k heaps, merged
    * on the driver; no global sort, no shuffle of the corpus at any
    * size. The selected ids are output (keys are doubles and engines may
    * differ in the last ulp of `ln`; id sets are stable because adjacent
    * A-ES keys in any real corpus are separated by far more than an
    * ulp). */
  def qWeightedSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val h = graft.functions.GraftFunctions
      .md5Hash64Array(array(col("doc_id").cast("string")))
      .getItem(0)
    val u = (shiftrightunsigned(h, 11) + 1).cast("double") / lit(9007199254740992.0) // 2^53
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .withColumn("__key", log(u) / col("n_chars").cast("double"))
      .orderBy(col("__key").desc)
      .limit(k)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Gopher-style intra-document repetition ratios: fraction of repeated
    * words and repeated bigrams per document, as integer basis points.
    * High-repetition documents are a standard training-data quality cut.
    * Pure per-row column algebra — a narrow codegen'd map, no shuffle at
    * any corpus size. Bigram ratio is null for docs under two tokens
    * (mirrored CASE in the oracle). */
  def qRepetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val words = wsTokens(col("text"))
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), words.as("words"))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        round((size(col("words")) - size(array_distinct(col("words")))) * 10000.0
          / size(col("words"))).cast("long").as("dup_word_bp"),
        round((size(bigrams(col("words"))) - size(array_distinct(bigrams(col("words")))))
          * 10000.0 / size(bigrams(col("words")))).cast("long").as("dup_bigram_bp"))
      .orderBy("doc_id")
  }

  /** Cross-document boilerplate spans — the C4 "repeated line" removal
    * signal re-expressed for unstructured text: for each document, how
    * many of its distinct 5-word spans occur in at least one OTHER
    * document. One explode + one groupBy(span) + one join-back — every
    * shuffle keys on the span, so the plan is linear in corpus size
    * (the span-frequency table is itself distributed; nothing is
    * collected or broadcast, unlike the fixed-size benchmark set in
    * [[qContamination]]). */
  def qBoilerplateSpans(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DedupOps.{hashedShingles, shinglesFromWords}
    // spans travel as 64-bit hashes (the DedupOps convention): the two
    // shuffles carry 8-byte keys instead of ~40-char strings. Per-doc
    // spans are DISTINCT by construction, so count(*) per span hash IS
    // the document frequency — no countDistinct Expand/double-shuffle.
    val ex = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        hashedShingles(shinglesFromWords(wsTokens(col("text")), 5)).as("spans"))
      // explode_outer: plain explode gets an inferred size(...)>0 filter
      // that re-evaluates the shingle transform (spans is never empty)
      .select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"),
        explode_outer(col("spans")).as("g"))
    // document frequency via count-over-window, NOT a groupBy + join-back:
    // a join would make the exploded subtree two plan branches, and the
    // (interpreted-HOF) shingle construction would run once per branch —
    // the window keeps it ONE branch, one shuffle on the span hash
    ex.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy("doc_id")
      .agg(
        max(col("n_spans")).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_spans"), col("n_shared"),
        round(col("n_shared") * 10000.0 / col("n_spans")).cast("long").as("boilerplate_bp"))
      .orderBy("doc_id")
  }

  /** Rare-word ratio — the document-frequency quality cut (OCR noise and
    * mojibake surface as words little else in the corpus uses): fraction
    * of each doc's DISTINCT words whose corpus document-frequency is
    * under 10% of the corpus — a RELATIVE threshold, so the cut means the
    * same thing at any corpus size. Same single-branch count-over-window
    * shape as [[qBoilerplateSpans]] (one shuffle on the word, one on the
    * doc); the corpus row count is quantizer-style scalar metadata,
    * memoized per (dir, snapshot) so repeat invocations don't re-scan. */
  def qRareWordRatio(spark: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.tableCount(spark, dir, "documents")
    val ex = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), array_distinct(wsTokens(col("text"))).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_distinct_words"),
        explode_outer(col("ws")).as("w"))
    ex.withColumn("df", count(lit(1)).over(Window.partitionBy(col("w"))))
      .groupBy("doc_id")
      .agg(
        max(col("n_distinct_words")).as("n_distinct_words"),
        sum(when(col("df") * 10 < lit(nDocs), 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_distinct_words"), col("n_rare"),
        round(col("n_rare") * 10000.0 / col("n_distinct_words")).cast("long").as("rare_word_bp"))
      .orderBy("doc_id")
  }

  /** Benchmark-contamination check: fraction of each document's distinct
    * 5-word spans that appear in a held-out benchmark set (here the
    * deterministic doc_id % 97 == 0 slice stands in for the eval suite).
    * The benchmark span universe is FIXED-size in practice (eval suites
    * don't grow with the corpus), so it is broadcast and the whole check
    * is a map-side semi-probe — no shuffle of the corpus at any scale. */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DedupOps.{hashedShingles, shinglesFromWords}
    // span hashes, not strings, through the broadcast probe (DedupOps
    // convention; the oracle verifies the per-doc counts exactly)
    val base = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        hashedShingles(shinglesFromWords(wsTokens(col("text")), 5)).as("spans"))
    val bench = base.filter(col("doc_id") % 97 === 0)
      .select(explode_outer(col("spans")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    base.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"),
        explode_outer(col("spans")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        max(col("n_spans")).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .select(col("doc_id"), col("n_spans"), col("n_contaminated"),
        round(col("n_contaminated") * 10000.0 / col("n_spans")).cast("long").as("contam_bp"))
      .orderBy("doc_id")
  }

  /** Heavy hitters with a count-min sketch gate — the one-pass
    * bounded-memory frequency-estimation pattern for 100 TB streams,
    * using Spark's native `count_min_sketch` aggregate (mergeable fixed-
    * size counter grid; the exact groupBy is the small-scale luxury the
    * sketch replaces when the token universe stops fitting in a shuffle).
    *
    * Tolerance-gated like the other sketches (q_approx_distinct /
    * q_approx_percentiles): the output carries the EXACT top-20 token
    * counts (hash-checked against DuckDB) plus an in-plan boolean per
    * row asserting the CMS estimate obeys its contract — never below the
    * true count, within eps·N above it (eps = 0.001, fixed seed ⇒
    * deterministic). The collected sketch is a few-KB summary blob — the
    * sanctioned metadata-collect shape (SURVEY §5), never row data; the
    * probe runs as a UDF over only the 20 result rows, not the corpus. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(spark, Tables.documents(spark, dir))
      .select(explode_outer(wsTokens(col("text"))).as("w"))
      .filter(col("w").isNotNull)
    val sketchBytes = toks
      .agg(expr("count_min_sketch(w, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    // the probe rides the native codegen'd CmsEstimate expression over
    // the sketch's serialized form (r17 — the repo's last UDF retired;
    // Spark ships the CMS aggregate but no scalar probe, SPARK-16283)
    val probe = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CmsEstimate(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("w")), sketchBytes.toIndexedSeq))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("exact_n"))
    val totalDf = counts.agg(sum("exact_n").as("__n_total"))
    counts.orderBy(col("exact_n").desc, col("w")).limit(20)
      .crossJoin(broadcast(totalDf))
      .withColumn("__est", probe)
      .select(col("w"), col("exact_n"),
        (col("__est") >= col("exact_n") &&
          col("__est") <= col("exact_n") + ceil(col("__n_total") * 0.001))
          .as("est_ok"))
      .orderBy(col("exact_n").desc, col("w"))
  }

  /** Ranked multi-term full-text search — the reference's tsvector GIN
    * surface (init.sql:144-145: `gin(to_tsvector('english', name || ' '
    * || oracle_text))`) expressed over the documents corpus: normalize to
    * word tokens (`\W+` split of the lowercased text — the tsvector
    * lexing step minus stemming), require ALL query terms (tsquery `&`
    * semantics), rank by total term frequency (the ts_rank analogue kept
    * INTEGRAL so the oracle hash is exact). The per-term counts ride the
    * scan as codegen'd array algebra — at 100 TB this is a full-scan
    * predicate like any other pushable filter chain, and the dedicated
    * posting-list index (the GIN equivalent) is the same inverted-index
    * pattern the dedup family builds. */
  def qFulltextSearch(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), "\\W+")
    def cnt(term: String) =
      size(filter(toks, t => t === lit(term))).cast("long")
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), cnt("data").as("n_data"), cnt("spark").as("n_spark"))
      .filter(col("n_data") > 0 && col("n_spark") > 0)
      .withColumn("score", col("n_data") + col("n_spark"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Sequence packing — concat-and-chunk the tokenized corpus into fixed
    * 2048-token training sequences (the pack-into-context-windows step of
    * an LLM data pipeline): documents stream in doc_id order, a doc
    * straddling a boundary splits across sequences. Emitted per doc:
    * global token start, first/last sequence id, offset within the first
    * sequence — everything a downstream chunker needs to cut sequences
    * without re-scanning.
    *
    * CONTRACT: the global running token sum over doc_id order (the DuckDB
    * oracle evaluates that literally as one window cumsum).
    * IMPLEMENTATION: never a global single-partition window — the classic
    * distributed prefix sum: (1) per-id-range partial token sums (one
    * tiny groupBy → ≤P-row collect of metadata, never rows); (2) a driver
    * scan turns partials into per-range prefix OFFSETS, broadcast back;
    * (3) within-range cumsum windows run in parallel, shifted by the
    * offset. Window partition size is corpus/P, so the plan survives a
    * 100× scale-up by raising P, where the naive global window serializes
    * the entire corpus through one task. */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(spark, Tables.spread(spark, Tables.documents(spark, dir)))

  /** The CURRENT packed manifest over the FULL corpus, served from the
    * session cache — for consumers that need the materialized artifact a
    * training pipeline keeps (the governance audits' BEFORE generation
    * and the access report's token_start column), not a re-derivation of
    * it. The exact convention of
    * [[graft.dedup.DedupOps.cachedDecisionFrame]]: erasure propagation
    * does not re-derive the before generation — only the AFTER re-pack is
    * the audit's own priced work. [[qPackSequences]] (the registered
    * entry) stays uncached: it IS the packing operator and must price its
    * own work. Snapshot-keyed, so a rewritten corpus invalidates. */
  private[graft] def cachedPackedManifest(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.cachedDirView(spark, "graft_packed_manifest", dir)(
      packSequences(spark, Tables.spread(spark,
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))))

  /** [[qPackSequences]]'s kernel over an explicit (doc_id, text) corpus —
    * factored so erasure propagation
    * ([[graft.operators.GovernanceOps.qGdprForgetKeys]]) can re-pack the
    * post-delete corpus (token starts shift for every survivor after the
    * first erased doc; packing is a prefix sum, so a row-delete on the
    * packed table would leave holes in the training sequences). */
  private[graft] def packSequences(spark: SparkSession, corpus: DataFrame): DataFrame =
    packUnits(spark,
      corpus.select(col("doc_id"),
        wsTokenCount(col("text")).as("n_tokens")),
      orderCols = Seq("doc_id"))
      .select("doc_id", "n_tokens", "token_start",
        "seq_first", "seq_last", "seq_offset")
      .orderBy("doc_id")

  /** The distributed prefix-sum packing kernel over arbitrary units —
    * any frame carrying `doc_id` (the range-bucket key), `n_tokens`,
    * and a global unit order given by `orderCols` (which must start
    * with doc_id so id-range buckets preserve the global order across
    * buckets). Shared by the doc-granularity [[packSequences]] and the
    * chunk-granularity [[qTextChunkPack]]; appends token_start /
    * seq_first / seq_last / seq_offset. Same scale contract as before
    * the factoring: per-range partials (≤P-row metadata collect),
    * driver offsets broadcast back, within-range cumsum windows in
    * parallel — never a global single-partition window.
    *
    * `maxIdHint`: an UPPER BOUND on doc_id, for callers whose `units`
    * frame is an expensive computed plan (the pipeline ledger, the
    * chunk election) — without it the kernel would EXECUTE that whole
    * plan once just to read max(doc_id) and again for the pack. Any
    * overestimate is fine: range width only grows, empty buckets get
    * no partial and no offset row. When absent, max(doc_id) is read
    * from `units` itself (cheap only when units is a near-raw scan —
    * parquet column stats). An empty units frame yields an empty
    * manifest (no NPE): the null max falls back to 0 and the empty
    * offsets join produces zero rows. */
  private[graft] def packUnits(spark: SparkSession, units: DataFrame,
      orderCols: Seq[String], maxIdHint: Option[Long] = None): DataFrame = {
    val B = 2048L
    // Materialize `units` ONCE (doc_id + n_tokens — two longs per unit):
    // the partials collect below and the final within-bucket window both
    // consume it, and without the barrier each executes the full unit
    // plan (the tokenize pass, or the caller's chunk election)
    // independently — job-level profiling at sf0.1 measured the partials
    // collect costing as much as the window pass itself. The checkpoint
    // also subsumes maxIdHint's reason to exist (the max(doc_id) read is
    // now a block read, not a plan re-run), but the hint is kept for
    // callers that know the bound without any job at all.
    val unitsM = units.localCheckpoint()
    // id-range buckets preserve global order across buckets
    val maxId = maxIdHint.getOrElse {
      val row = unitsM.agg(max("doc_id")).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    val p = spark.sparkContext.defaultParallelism
    val width = math.max(1L, (maxId + p) / p)
    val bucketed = unitsM.withColumn("__b", expr(s"doc_id DIV $width"))
    val partials = bucketed.groupBy("__b").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partials.map { case (b, t) => val row = (b, acc); acc += t; row }
    val spark2 = spark
    import spark2.implicits._
    val offDf = offsets.toSeq.toDF("__b", "__off")
    val w = Window.partitionBy("__b").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offDf), "__b")
      .withColumn("__local_end", sum("n_tokens").over(w))
      .withColumn("token_start",
        col("__off") + col("__local_end") - col("n_tokens"))
      .withColumn("seq_first", expr(s"token_start DIV $B"))
      .withColumn("seq_last", expr(s"(token_start + n_tokens - 1) DIV $B"))
      .withColumn("seq_offset", col("token_start") % B)
      .drop("__b", "__off", "__local_end")
  }

  /** Deterministic global corpus shuffle — the training-order
    * randomization run before sequence packing (documents land in
    * source/crawl order, which is heavily clustered by domain and time;
    * packing in that order bakes locality into every context window):
    * each doc draws `shuffle_key` = md5-64 of its id (a fixed
    * pseudorandom permutation both engines replay bit-exactly — and
    * reshuffling epoch e is one seed-concat away) and `shuffle_rank` =
    * its 0-based global position in (shuffle_key, doc_id) order.
    *
    * CONTRACT: one global row_number over the key order (the oracle
    * states it literally). IMPLEMENTATION: the same trick as
    * [[packUnits]] but for COUNTS — never a global single-partition
    * window: key-RANGE buckets (order-preserving across buckets), a
    * ≤P-row metadata collect of per-bucket counts, driver prefix
    * offsets broadcast back, within-bucket row_number in parallel.
    * Survives a 100× scale-up by raising P; the naive global
    * row_number serializes the corpus through one task. */
  def qTextGlobalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        shiftrightunsigned(
          graft.dedup.DedupOps.md5Hash64(col("doc_id").cast("string")), 1)
          .as("shuffle_key"))
    // key range is [0, 2^63): split into P order-preserving bands
    val p = spark.sparkContext.defaultParallelism
    val width = Long.MaxValue / p + 1L
    val bucketed = keyed.withColumn("__b", expr(s"shuffle_key DIV $width"))
    val partials = bucketed.groupBy("__b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partials.map { case (b, c) => val row = (b, acc); acc += c; row }
    val spark2 = spark
    import spark2.implicits._
    val offDf = offsets.toSeq.toDF("__b", "__off")
    val w = Window.partitionBy("__b").orderBy("shuffle_key", "doc_id")
    bucketed.join(broadcast(offDf), "__b")
      .withColumn("shuffle_rank",
        col("__off") + row_number().over(w) - 1L)
      .select(col("doc_id"), col("shuffle_key"), col("shuffle_rank"))
      .orderBy("doc_id")
  }

  // ---- end-to-end pipeline: lang gate → quality gate → dedup → pack ----

  /** Per-document decision ledger for the composed training-data
    * pipeline — each doc carries its predicted language, classifier
    * logit, and the three CUMULATIVE stage-keep flags (`lang_keep` ⊇
    * `q_keep` ⊇ `dedup_keep`), so both pipeline entries read one frame
    * instead of re-running upstream stages per stage.
    *
    * Stage semantics are the registered standalone entries VERBATIM
    * (same kernels, not re-implementations): language gate =
    * [[withLangPred]] (text_lang_id) keeping predicted `en`; quality
    * gate = [[qualityLogits]] (text_quality_classifier) keeping
    * logit > 0; exact dedup elects min(doc_id) per full-text key AMONG
    * quality survivors (the dedup_exact rep rule — a `min(when(...))`
    * window KEYED ON `xxhash64(text)`, the dedup_exact key convention,
    * so dropped docs still carry their flags for the funnel).
    *
    * The synthetic corpus has no natural full-text duplicates among
    * gate survivors, so the ingest plants exact twins of the
    * prose-class docs (doc_id ≡ 1 mod 5, offset +1,000,000 — the
    * dedup_exact convention; the offset preserves doc_id mod 5, so a
    * twin rides through the language and quality gates WITH its base
    * and the dedup stage carries real traffic at every SF).
    *
    * Scale shape: one narrow scan computes tokens/langid per row, the
    * classifier adds its broadcast weight join + one doc_id groupBy,
    * the ledger join re-uses that doc_id partitioning, and the dedup
    * election is ONE shuffle keyed on the 8-byte `xxhash64(text)` —
    * NOT on the raw text: `text` is projected away below the election
    * window, so the only corpus-wide exchange in the composed plan
    * ships (doc_id, hash, flags) rows, not document bodies (at 100 TB
    * that is the difference between shuffling ~1 TB of keys and the
    * whole corpus; TextOpsSpec pins the exchange as text-free). Nothing
    * here is corpus-quadratic and no stage re-reads the corpus — the
    * flags compose in-plan. */
  private[graft] def pipelineLedger(spark: SparkSession, dir: String,
      maxRawId: Long): DataFrame = {
    // the planted-twin offset must clear the raw id space, or twins
    // collide with real doc_ids and the dedup semantics silently
    // degrade (the oracle replays the same arithmetic, so the gate
    // would stay green) — derived from max(doc_id), same spirit as
    // ScalingBench's replica guard
    val off = pipelineTwinOffset(maxRawId)
    val base = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val docs = base
      .unionByName(base.filter(pmod(col("doc_id"), lit(5)) === 1)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      .select(col("doc_id"), col("text"),
        wsTokenCount(col("text")).as("n_tokens"))
    // everything that reads the document body happens in THIS per-row
    // projection (token count, lang-ID hits, the 8-byte dedup key);
    // `text` is dropped before any exchange, so neither the doc_id
    // join shuffle nor the election shuffle ships document bodies
    val scored = withLangPred(docs)
      .withColumn("__h", xxhash64(col("text")))
      .select(col("doc_id"), col("__h"), col("n_tokens"), col("pred_lang"))
      .join(qualityLogits(spark, docs).select("doc_id", "logit_sum"), Seq("doc_id"))
    scored
      .withColumn("lang_keep", col("pred_lang") === "en")
      .withColumn("q_keep", col("lang_keep") && col("logit_sum") > 0)
      .withColumn("__rep",
        min(when(col("q_keep"), col("doc_id"))).over(Window.partitionBy("__h")))
      .withColumn("dedup_keep", col("q_keep") && col("doc_id") === col("__rep"))
  }

  /** Planted-twin doc_id offset for the composed pipeline (the
    * dedup_exact convention) at oracle-gated corpora. */
  private[graft] val PipelineTwinOffset = 1000000L

  /** Collision-free twin offset: the oracle's 1,000,000 whenever the
    * raw id space fits under it (every gated SF — the oracle replays
    * that constant), else the next multiple above max(doc_id) — so the
    * ScalingBench amplified corpora (replica ids at i·1e8) keep
    * collision-free twins WITH their doc-class (any multiple of 1e6 is
    * ≡ 0 mod 5, preserving the mod-5 gate class the twin rides on). */
  private[graft] def pipelineTwinOffset(maxRawId: Long): Long =
    if (maxRawId < PipelineTwinOffset) PipelineTwinOffset
    else (maxRawId / PipelineTwinOffset + 1L) * PipelineTwinOffset

  /** Max raw doc_id — shared by both pipeline entries so the guard and
    * the pack's range-bucket hint read the same scan. */
  private[graft] def pipelineMaxRawId(spark: SparkSession, dir: String): Long =
    Tables.documents(spark, dir).agg(max("doc_id")).head().getLong(0)

  /** End-to-end pipeline — the run a training-data corpus actually
    * ships through: language gate → quality-classifier gate → exact
    * dedup → sequence packing, emitting the final packed manifest
    * (doc_id → token_start/seq_first/seq_offset) over the surviving
    * corpus. Every stage is the registered standalone operator applied
    * in composition (see [[pipelineLedger]]); packing re-uses the
    * distributed prefix sum ([[packUnits]]), so the composed plan
    * inherits each stage's scale contract. The oracle replays the whole
    * chain as one SQL body — a hash mismatch localizes to composition,
    * since each stage is separately gated.
    *
    * The pack reuses the ledger's n_tokens (no re-tokenization pass,
    * no wide text column through the pack exchange) and bounds the
    * range buckets from the RAW documents scan (+ the twin band) so
    * the expensive ledger plan executes once, not twice. */
  def qPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val maxRawId = pipelineMaxRawId(spark, dir)
    packUnits(spark,
      pipelineLedger(spark, dir, maxRawId).filter(col("dedup_keep"))
        .select("doc_id", "n_tokens"),
      orderCols = Seq("doc_id"),
      maxIdHint = Some(maxRawId + pipelineTwinOffset(maxRawId)))
      .select("doc_id", "n_tokens", "token_start",
        "seq_first", "seq_last", "seq_offset")
      .orderBy("doc_id")
  }

  /** Pipeline funnel — the observability twin of [[qPipelineE2e]]: doc
    * and token counts surviving each stage (the first dashboard anyone
    * builds over a filtering pipeline). One ledger pass, one global
    * aggregate, `stack` to (stage, n_docs, n_tokens) rows — the
    * four-row output is metadata-sized at any corpus size. */
  def qPipelineFunnel(spark: SparkSession, dir: String): DataFrame =
    pipelineLedger(spark, dir, pipelineMaxRawId(spark, dir))
      .agg(
        count(lit(1)).as("d0"), sum("n_tokens").as("t0"),
        sum(when(col("lang_keep"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("lang_keep"), col("n_tokens")).otherwise(0L)).as("t1"),
        sum(when(col("q_keep"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("q_keep"), col("n_tokens")).otherwise(0L)).as("t2"),
        sum(when(col("dedup_keep"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("dedup_keep"), col("n_tokens")).otherwise(0L)).as("t3"))
      .selectExpr(
        """stack(4,
          |  '0_ingest',  d0, t0,
          |  '1_lang_en', d1, t1,
          |  '2_quality', d2, t2,
          |  '3_dedup',   d3, t3) AS (stage, n_docs, n_tokens)""".stripMargin)
      .orderBy("stage")

  /** Bigram novelty — the n-gram LM cousin of [[qRareWordRatio]]'s
    * unigram cut and a cheap perplexity proxy: how much of a document's
    * distinct-bigram vocabulary appears NOWHERE else in the corpus
    * (document frequency 1). Templated/duplicated text scores near 0;
    * original prose scores high. Inverted-index shape: one distinct-
    * bigram explode, one df aggregation, one key join back — each linear
    * in corpus size; hot boilerplate bigrams are bounded by doc count and
    * AQE's skew-join split handles the join tail. */
  def qBigramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // same bigram SET as [[bigrams]]/[[qNgramFreq]] but keyed by the
    // 64-bit shingle hash (the native [[graft.dedup.DedupOps
    // .shingleHashes]] kernel, n=2, already distinct per doc): df only
    // needs bigram EQUALITY, so the exploded stream and both shuffles
    // carry 8-byte longs instead of rebuilt bigram strings, and the
    // per-row shingle pass is one codegen'd kernel instead of an
    // interpreted transform chain. Within-corpus xxhash64 collisions
    // would merge two bigrams' df counts: expected colliding pairs =
    // n_distinct^2 / 2^65 — ~3e-7 at this corpus, and still only ~1e-6
    // relative novelty error at a 1e11-bigram (100 TB) corpus, noise for
    // a df=1 novelty heuristic. The sub-2-token docs bigrams() nulls out
    // are excluded by the size filter (shingleHashes would give them one
    // whole-array shingle), keeping them on the left-join zero path.
    // df rides a count-over-window on the exploded stream
    // (the qRareWordRatio pattern) — TWO shuffles (bigram key, then
    // doc_id) instead of the aggregate-then-join-back form's three.
    val agg = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 2)
      // explode_outer dodges InferFiltersFromGenerate's size(...)>0
      // pre-filter, which would re-evaluate the kernel (arrays are
      // non-empty here anyway — n=2 over >=2 words)
      .select(col("doc_id"),
        explode_outer(graft.dedup.DedupOps.shingleHashes(col("words"), 2)).as("g"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_bigrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
    // left join keeps docs with <2 tokens (no bigrams) at zero
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_distinct_bigrams").isNull, 0L)
          .otherwise(round(col("n_novel") * 10000.0 / col("n_distinct_bigrams")).cast("long"))
          .as("novelty_bp"))
      .orderBy("doc_id")
  }

  /** Vocabulary size for [[qVocabEncode]] — a model constant, not a
    * corpus-derived value, which is what keeps the id-assignment window
    * bounded at any corpus size. Deliberately set BELOW the synthetic
    * corpus's 31-token vocabulary so the OOV/UNK path carries real
    * traffic in every gate run (production would use 32k-256k — only
    * this constant changes). */
  private val VocabSize = 16

  /** Vocabulary construction + document encoding — the tokenize → vocab →
    * id-sequence step of a training-data pipeline. The vocab is the top
    * [[VocabSize]] words by (count DESC, word) with contiguous 1-based
    * ids; id assignment is a TakeOrdered over a BOUNDED set (vocab size
    * is a model constant), then a row_number whose unpartitioned window
    * holds ≤ VocabSize rows — corpus-scale work is only the word count
    * and the broadcast-joined encode pass. Out-of-vocab tokens map to 0
    * (the UNK convention). Each doc emits its token/UNK counts and a
    * position-weighted integer checksum of the id sequence —
    * order-sensitive, so any drift in tokenization, ranking, or join
    * semantics breaks the oracle hash. */
  def qVocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("words"))
    val vocab = docs.select(explode(col("words")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(VocabSize)
      .withColumn("id",
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))).cast("long"))
      .select("w", "id")
    docs.select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "w")))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_unk"),
        sum((col("pos") + 1).cast("long") * coalesce(col("id"), lit(0L)))
          .as("ids_checksum"))
      .orderBy("doc_id")
  }

  /** BPE merge-pair mining — the inner statistic of byte-pair-encoding
    * vocabulary training (Sennrich et al. 2016): for every adjacent
    * character pair inside a word, total occurrences across the corpus
    * weighted by word frequency; the top pair is the next BPE merge.
    *
    * Scale shape, the reason BPE training is feasible at corpus size:
    * the corpus collapses to its VOCABULARY first (one word-count
    * groupBy, map-side combined, vocabulary-sized keys), and the pair
    * explosion runs over distinct words only — pair stats shuffle a
    * pair-universe-sized frame (≤ alphabet², tiny), never the corpus.
    * Pairs are 2-char substrings (no end-of-word marker — merges stay
    * within words by construction here since pairs never span the
    * whitespace split). Top 50 by count, pair ascending on ties. */
  def qBpePairs(spark: SparkSession, dir: String): DataFrame = {
    val wordFreq = Tables.spread(spark, Tables.documents(spark, dir))
      .select(explode_outer(wsTokens(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word")
      .agg(count(lit(1)).as("f"))
    wordFreq
      .select(col("f"), explode_outer(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum(col("f")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)
  }

  /** The planted ranked merge table for [[qBpeEncode]] — a model
    * artifact, not a corpus statistic (production ships the merges
    * `text_bpe_pairs`-style mining produced at TRAIN time; encode must
    * apply a FROZEN table), so it is a literal both engines share. The
    * list deliberately exercises cascading merges (t+h → th, th+e →
    * the), merges whose left side is itself a merged symbol, and pairs
    * that interact on real corpus words (or/ro, at/an).
    *
    * TABLE CONTRACT (ADVICE r11, spec-pinned in TextOpsSpec):
    * [[qBpeEncode]] applies each rank exactly ONCE, in rank order — that
    * single pass equals full iterative BPE only while no merge's OUTPUT
    * symbol is a component of an earlier-or-equal-rank pair (applying
    * rank i could otherwise re-create instances of a pair whose pass has
    * already run, which true BPE would merge and the single pass would
    * not). Any edit to this table must preserve the property; the spec
    * validates it mechanically so a violating edit fails CI instead of
    * silently diverging from real-tokenizer semantics while both engines
    * still agree. */
  private[graft] val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "e" -> "r", "a" -> "t", "s" -> "t",
    "a" -> "n", "o" -> "r", "r" -> "o", "i" -> "n", "l" -> "o")

  /** Tokenizer-complete BPE ENCODE (VERDICT r10 ask #7) — apply the
    * ranked merge table iteratively to produce real subword ids, the
    * exact preprocessing a trainer ships (`text_bpe_pairs` mines the
    * merges; `text_vocab_encode` stops at word ids; this closes the
    * loop). Per vocabulary word: start from the character sequence and
    * apply each merge in rank order, merging all non-overlapping
    * adjacent occurrences leftmost-first (the Sennrich et al. 2016
    * convention).
    *
    * The merge application runs as a per-row chain of three string
    * replaces per rank over a space-delimited symbol string — the
    * doubled-delimiter trick: doubling every separator gives each
    * symbol boundary two spaces, the pattern ` l  r ` consumes one from
    * each side, so adjacent matches cannot steal each other's boundary
    * and plain leftmost-consuming `replace` reproduces BPE's
    * non-overlapping scan exactly (`a a a a` + (a,a) → `aa aa`, not
    * `aa a a`). Both engines' `replace` share that contract, so the
    * oracle replays every merge byte-identically.
    *
    * Scale shape (the `text_bpe_pairs` precedent): the corpus collapses
    * to its VOCABULARY first (one map-side-combined word count), and
    * every later step — the merge chain, the subword-id window, the
    * checksum join — runs on vocabulary-sized frames; the id window is
    * bounded by the subword-vocab size (chars + merge table), a model
    * constant. `roundtrip_ok` asserts concat(subwords) == word — ids
    * decode back to the exact word — and the position-weighted checksum
    * pins the full id sequence into the oracle hash. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.spread(spark, Tables.documents(spark, dir))
      .select(explode_outer(wsTokens(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
    // ' w o r d ' — every char space-prefixed, one trailing space
    val sym0 = concat(regexp_replace(col("word"), "(.)", " $1"), lit(" "))
    val merged = BpeMerges.foldLeft(sym0) { case (s, (l, r)) =>
      expr_replace(
        expr_replace(
          expr_replace(s, lit(" "), lit("  ")),
          lit(s" $l  $r "), lit(s" $l$r ")),
        lit("  "), lit(" "))
    }
    val enc = words
      .withColumn("subwords", split(trim(merged), " "))
      .withColumn("n_chars", length(col("word")).cast("long"))
      .withColumn("n_subwords", size(col("subwords")).cast("long"))
      .withColumn("roundtrip_ok", concat_ws("", col("subwords")) === col("word"))
    // subword-id table: bounded by chars + merges (a model constant),
    // so the unpartitioned ranking window holds a handful of rows
    val ids = enc.select(explode(col("subwords")).as("sub")).distinct()
      .withColumn("id", row_number().over(Window.orderBy(col("sub"))).cast("long"))
    enc.select(col("word"), col("f"), col("n_chars"), col("n_subwords"),
        col("roundtrip_ok"), posexplode(col("subwords")).as(Seq("pos", "sub")))
      .join(broadcast(ids), "sub")
      .groupBy("word")
      .agg(first("f").as("f"), first("n_chars").as("n_chars"),
        first("n_subwords").as("n_subwords"),
        sum((col("pos") + 1).cast("long") * col("id")).as("ids_checksum"),
        first("roundtrip_ok").as("roundtrip_ok"))
      .select(col("word"), col("f"), col("n_chars"), col("n_subwords"),
        col("ids_checksum"), col("roundtrip_ok"))
      .orderBy("word")
  }

  /** Spark's `functions` object gained `replace` only recently; route
    * through the SQL expression so the call is version-stable. */
  private def expr_replace(src: Column, find: Column, repl: Column): Column =
    call_function("replace", src, find, repl)

  /** n-gram LM quality scoring (the CCNet / KenLM-filter stage): a
    * word-bigram language model with add-one smoothing is trained on a
    * held-out reference slice (every 5th doc), and every remaining doc
    * is scored by its total and mean negative log-likelihood — low
    * perplexity ≈ reference-like prose, high ≈ noise. The standard
    * quality cut when a learned LM is the filter.
    *
    * NLL of bigram (w1,w2) = ln((C(w1)+V) / (C(w1,w2)+1)) — C counts
    * from the reference slice, V its vocabulary size; an unseen w1
    * degrades to ln(V/1), the uniform fallback. Each bigram's NLL is
    * quantized to integer MICRONATS per row BEFORE any aggregation
    * (the cos_ppm precedent): summing doubles across rows is partition-
    * order-dependent and engine-divergent, while a sum of per-row
    * integers is exact everywhere, so the gate compares bit-equal longs.
    *
    * Scale shape: the LM tables are vocabulary-sized aggregates (map-
    * side combined), the scoring pass is two equi-joins on word keys
    * (AQE broadcasts them when the vocab fits, the realistic case), and
    * V rides a broadcast one-row cross join — nothing corpus-sized
    * shuffles twice. */
  def qLmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("words"))
    val isRef = col("doc_id") % 5 === 0
    val refWords = docs.filter(isRef)
      .select(col("doc_id"), explode_outer(col("words")).as("w"))
    val uni = refWords.groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).cast("long").as("v"))
    // bigram counts keyed by the pair STRING ("w1 w2"): instance streams
    // join on it directly; counts are over OCCURRENCES, so the shingle
    // helpers' array_distinct must not apply — pairs rebuilt positionally
    // the >=2 guard matters on BOTH passes: sequence(1, size-1) DESCENDS
    // for 1-word docs ([1,0]) and element_at(words, 0) is an ANSI error
    val biOcc = docs.filter(isRef)
      .filter(size(col("words")) >= 2)
      .select(explode_outer(transform(
        sequence(lit(1), size(col("words")) - 1),
        i => concat_ws(" ", element_at(col("words"), i), element_at(col("words"), i + 1)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val scored = docs.filter(!isRef)
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"),
        explode_outer(transform(
          sequence(lit(1), size(col("words")) - 1),
          i => struct(element_at(col("words"), i).as("w1"),
            concat_ws(" ", element_at(col("words"), i),
              element_at(col("words"), i + 1)).as("bg")))).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.bg").as("bg"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .join(biOcc, Seq("bg"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("c1"), lit(0L)) + col("v")).cast("double") /
          (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double")) * 1e6)
          .cast("long").as("nll_unat"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_unat")).as("nll_sum_unat"))
    scored
      .select(col("doc_id"), col("n_bigrams"),
        col("nll_sum_unat"),
        floor(col("nll_sum_unat") / col("n_bigrams")).cast("long").as("mean_nll_unat"))
      .orderBy("doc_id")
  }

  /** Per-document top-3 TF-IDF terms — the classic salient-term extractor
    * (keyword tagging / topic routing / relevance features downstream of
    * [[qFulltextSearch]]'s raw-TF ranking). IDF is quantized to integer
    * micronats per TERM before any multiplication (`round(ln(N/df)·1e6)`
    * — the [[qLmPerplexity]] precedent, so the gate compares exact
    * longs), and the per-doc score is the exact integer `tf · idf_unat`.
    * A term present in every document scores 0 (ln 1), so stopwords
    * drop out of the top ranks by construction.
    *
    * Scale shape: tf is one map-side-combined groupBy on (doc, word);
    * df is a vocabulary-sized aggregate that AQE broadcasts back onto
    * the tf stream (vocab ≪ corpus, the realistic case); N is memoized
    * scalar metadata. The per-doc top-3 runs through the repo's own
    * bounded-heap [[graft.plans.TopKPerGroupExec]] — O(n log k) with one
    * group-key shuffle, never a full per-doc sort of the scored stream. */
  def qTfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.tableCount(spark, dir, "documents")
    val occ = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode_outer(wsTokens(col("text"))).as("term"))
    val tf = occ.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df falls out of tf for free (one tf row per doc×term), so the
    // corpus is exploded ONCE and the second use of the tf subtree rides
    // a ReusedExchange instead of a second scan+Generate pass
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(log(lit(nDocs.toDouble) / col("df")) * 1e6).cast("long").as("idf_unat"))
    val scored = tf.join(df, "term")
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * col("idf_unat")).as("score_unat"))
    val top = graft.plans.TopK.topKPerGroup(scored, 3,
      Seq(col("doc_id")), Seq(col("score_unat").desc, col("term")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_unat").desc, col("term"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("score_unat"))
      .orderBy("doc_id", "rank")
  }

  /** Per-document unigram entropy — the Gopher-lineage distributional
    * quality cut (templated/repetitive text has LOW word-distribution
    * entropy; natural prose is high): H = Σ_w (c_w/n)·ln(n/c_w) over the
    * doc's own word frequencies. Each word's surprisal `ln(n/c)` is
    * quantized to integer MICRONATS before the weighted sum (the
    * [[qLmPerplexity]] / [[qTfidfTopTerms]] precedent — double sums are
    * partition-order/engine-divergent, integer sums are not), so
    * `entropy_sum_unat = Σ c·round(ln(n/c)·1e6)` = n × H in micronats is
    * exact on both engines; the per-token mean is a floor division. A
    * one-word-repeated doc scores 0; a doc of n distinct words scores
    * ln(n).
    *
    * Scale shape: one map-side-combined groupBy(doc, word) for counts,
    * the per-doc total as a doc-partitioned window over the counts frame
    * (bounded by per-doc vocabulary, never corpus-wide), one final
    * groupBy(doc). Linear, two shuffles on the same doc_id key — AQE
    * plans the second as a ReusedExchange-adjacent local agg. */
  def qUnigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val wDoc = Window.partitionBy("doc_id")
    tf.withColumn("n", sum("c").over(wDoc))
      .withColumn("surprisal_unat",
        round(log(col("n").cast("double") / col("c").cast("double")) * 1e6)
          .cast("long"))
      .groupBy("doc_id")
      .agg(max("n").as("n_tokens"),
        count(lit(1)).as("n_distinct_words"),
        sum(col("c") * col("surprisal_unat")).as("entropy_sum_unat"))
      .withColumn("mean_entropy_unat",
        floor(col("entropy_sum_unat") / col("n_tokens")).cast("long"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance weights (Xie et al. 2023, Data Selection via
    * Importance Resampling — the domain-matching selection stage: score
    * every raw document by how target-domain-like its word distribution
    * is, then resample proportionally). Target here is the `src0-src3`
    * slice (a fifth of the corpus standing in for "the domain we want
    * more of"); the feature LM is add-one-smoothed unigrams, so a word's
    * log importance ratio is
    * `ln(((ct+1)·(nr+V)) / ((cr+1)·(nt+V)))` — ct/cr the target/raw
    * corpus counts, nt/nr the token totals, V the raw vocabulary — and a
    * document's weight is the sum over its word OCCURRENCES. Each
    * per-occurrence term is quantized to integer MICRONATS before
    * summation (the [[qLmPerplexity]] precedent: double sums are
    * partition-order/engine-divergent; the downstream resampler in
    * [[qWeightedSample]]'s A-ES shape consumes the weights unchanged).
    *
    * Scale shape: the LM tables are vocabulary-sized map-side-combined
    * aggregates, the three corpus scalars ride one broadcast single-row
    * frame, and scoring is two word-key equi-joins (AQE broadcasts
    * vocab-sized sides in the realistic case) — nothing corpus-sized
    * shuffles more than once, the exact [[qLmPerplexity]] plan family. */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), wsTokens(col("text")).as("words"))
    val occ = docs.select(col("doc_id"),
      col("source").isin("src0", "src1", "src2", "src3").as("tgt"),
      explode_outer(col("words")).as("w"))
    val raw = occ.groupBy("w").agg(count(lit(1)).as("cr"))
    val tgtLm = occ.filter(col("tgt")).groupBy("w").agg(count(lit(1)).as("ct"))
    val scalars = occ.agg(
      count(lit(1)).cast("long").as("nr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).cast("long").as("nt"),
      countDistinct(col("w")).cast("long").as("v"))
    // factors go to double BEFORE multiplying: the long product is exact
    // here but would overflow ANSI long arithmetic at fleet token counts,
    // and IEEE doubles of exact integers multiply identically everywhere
    occ.join(raw, Seq("w"))
      .join(tgtLm, Seq("w"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        round(log(
          (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
            (col("nr") + col("v")).cast("double") /
            ((col("cr") + lit(1L)).cast("double") *
              (col("nt") + col("v")).cast("double"))) * 1e6)
          .cast("long").as("lw_unat"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("lw_unat").as("logw_sum_unat"))
      // `div` (truncate toward zero), NOT floor: weights are NEGATIVE for
      // off-domain docs and DuckDB's integer `//` truncates — floor would
      // disagree by one micronat on every negative inexact division
      .withColumn("mean_logw_unat",
        expr("logw_sum_unat div n_words").cast("long"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): every scored
    * doc labeled head/middle/tail by its per-language perplexity tercile
    * — the standard "keep head+middle, drop tail" corpus cut downstream
    * of [[qLmPerplexity]]. CCNet computes its cutoffs from a held-out
    * sample, and so does this: tercile cutoff VALUES come from a
    * deterministic ~1000-doc md5-bucket sample (the [[qStratifiedSample]]
    * portable-hash contract; cap = ceil(1024·1000/n) of 1024 hash
    * buckets), ranked per language in a BOUNDED window — never a
    * total-order window over the corpus (the text_budget_select lesson).
    * Every doc is then bucketed by integer comparison against the
    * broadcast per-language cutoffs, a narrow codegen'd map. Cutoffs are
    * actual sample values (discrete terciles, ranks ceil(m/3) and
    * ceil(2m/3)), so comparisons are integer-exact — no interpolated
    * double whose last ulp could flip a boundary doc between engines. */
  def qCcnetBucket(spark: SparkSession, dir: String): DataFrame = {
    val scored = qLmPerplexity(spark, dir).select(col("doc_id"), col("mean_nll_unat"))
    // Materialize the scored frame ONCE (3 narrow columns, one row per
    // doc): the sample collect below and the final bucketing join both
    // consume it, and without the barrier each executes the whole
    // corpus-sized LM-scoring subtree independently — job-level profiling
    // at sf0.1 measured the scoring pass run twice per invocation, ~45%
    // of the entry's wall (guide §1.1/§5: cut lineage for a reused
    // intermediate that is small relative to what produced it).
    val withLang = scored
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint()
    val n = Tables.tableCount(spark, dir, "documents")
    val cap = math.min(1024L, (1024L * 1000L + n - 1) / n)
    val hb = shiftrightunsigned(graft.functions.GraftFunctions
      .md5Hash64Array(array(col("doc_id").cast("string"))).getItem(0), 8)
      .bitwiseAND(lit(1023L))
    // Per-language AND global tercile cutoffs from ONE bounded driver
    // collect of the sample's (lang, value, doc_id) rows (<= ~1024 —
    // the budget_select histogram pattern). The global cutoffs are the
    // fallback for a language the sample happened to miss (ADVICE r9):
    // with null per-lang cutoffs every doc of an unsampled rare language
    // fell through to 'tail', so the standard keep-head+middle policy
    // silently dropped the entire language; global cutoffs are the
    // CCNet-faithful degradation until the language has sample mass.
    // Driver-side deliberately: the plan alternative (a second windowed
    // aggregation over `sampled`) re-evaluates the whole CORPUS-sized
    // LM-scoring subtree a third time (the sample filter sits above the
    // scoring, not below it). At sf0.1 an isolated A/B measures the two
    // forms equal — the scoring pass is cheap there — but at scale the
    // third evaluation is a full extra corpus pass, while this is
    // integer arithmetic over ~1000 collected rows.
    val sample = withLang.filter(hb < lit(cap))
      .select(col("lang"), col("mean_nll_unat"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // cutoff VALUE at 1-based rank ceil(m/3) / ceil(2m/3) in
    // (value, doc_id) order — identical arithmetic to the oracle SQL
    def tercilesOf(rows: Seq[(String, Long, Long)]): (Long, Long) = {
      val sorted = rows.map(t => (t._2, t._3)).sorted
      val m = sorted.length
      (sorted(((m + 2) / 3 - 1).toInt)._1, sorted(((2 * m + 2) / 3 - 1).toInt)._1)
    }
    // empty sample -> null cutoffs -> every comparison null -> 'tail',
    // exactly the oracle's max-over-empty semantics
    val (g1Col, g2Col) =
      if (sample.isEmpty) (lit(null).cast("long"), lit(null).cast("long"))
      else { val (g1, g2) = tercilesOf(sample.toSeq); (lit(g1), lit(g2)) }
    val spark2 = spark
    import spark2.implicits._
    val cuts = sample.toSeq.groupBy(_._1).map { case (lang, rows) =>
      val (c1, c2) = tercilesOf(rows)
      (lang, c1, c2)
    }.toSeq.toDF("lang", "c1", "c2")
    withLang.join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("mean_nll_unat"),
        when(col("mean_nll_unat") <= coalesce(col("c1"), g1Col), lit("head"))
          .when(col("mean_nll_unat") <= coalesce(col("c2"), g2Col), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
      .orderBy("doc_id")
  }

  /** Exact-substring near-dup pairs (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): report document pairs
    * sharing a long VERBATIM word run — the duplication mode Jaccard and
    * MinHash miss when two long documents share one copied paragraph.
    * The suffix-array construction of the paper is approximated the
    * distributed way: positional 8-gram postings (64-bit portable md5
    * keys, 8-byte shuffle rows), an inverted-index self-join, and shared
    * runs recovered as maximal DIAGONALS — matches with equal `pa − pb`
    * at consecutive positions chain into runs via the classic
    * `pos − row_number()` grouping. A run of r consecutive shared
    * 8-grams is a shared substring of r+7 words; pairs with a run ≥ 2
    * (≥ 9 shared words) are emitted with their longest run and total
    * shared-gram mass.
    *
    * Scale shape: postings are linear in corpus tokens; the self-join is
    * bounded per gram by the df ≤ 32 hot-gram cap (ultra-common 8-grams
    * are boilerplate — [[qBoilerplateSpans]]'s business, and dropping
    * them only splits a run at positions the cap fired, exactly like the
    * AllPairs prefix filter's bounded-candidate argument); the run
    * windows partition by (pair, diagonal) — thousands of tiny
    * partitions, never a corpus-wide sort.
    *
    * Cap POLICY (r10, spec-pinned in TextOpsSpec): a verbatim run made
    * ONLY of hot grams — e.g. two docs whose entire overlap is a
    * boilerplate header pasted into 40+ other docs — is dropped
    * entirely, BY DESIGN: reporting it would report the header's
    * quadratic pair fan-out (10^5 carrier docs → 10^9 pairs), and the
    * duplicated mass is precisely what the boilerplate detector already
    * surfaces span-by-span. Any overlap with ≥ 2 consecutive rare grams
    * still reports its pair. */
  def qSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("w"))
      // guard BEFORE sequence(): sequence(1, size-7) DESCENDS when the
      // doc has fewer than 8 words (the qLmPerplexity lesson)
      .filter(size(col("w")) >= 8)
    val grams = docs
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        shiftrightunsigned(graft.functions.GraftFunctions
          .md5Hash64Array(array(col("col"))).getItem(0), 1).as("gram_h"))
    val rare = grams.groupBy("gram_h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") <= 32)
      .select("gram_h")
    val capped = grams.join(rare, "gram_h")
    val hits = capped.select(col("gram_h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .join(capped.select(col("gram_h"), col("doc_id").as("doc_b"), col("pos").as("pb")),
        Seq("gram_h"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("diag", col("pa") - col("pb"))
    val runs = hits
      .withColumn("grp", col("pa") - row_number().over(
        Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(count(lit(1)).as("run_len"))
    runs.groupBy("doc_a", "doc_b")
      .agg((max("run_len") + 7).cast("long").as("longest_words"),
        sum("run_len").cast("long").as("n_shared_grams"))
      .filter(col("longest_words") >= 9)
      .orderBy("doc_a", "doc_b")
  }

  /** Corpus-level span dedup WITH reconstruction — the C4 / RefinedWeb
    * "remove repeated three-sentence spans, keep one occurrence"
    * transform ([[qBoilerplateSpans]] only SCORES the sharing; this
    * entry actually REWRITES the corpus). The synthetic docs carry no
    * newlines, so the span unit is the deterministic 10-word chunk
    * (strided, not sliding — each word belongs to exactly ONE span, the
    * property that makes removal well-defined): a chunk occurrence
    * survives iff it is the corpus-wide FIRST occurrence of that chunk
    * text, ordered by (doc_id, chunk_no) — later occurrences, including
    * repeats inside the same document, are dropped, and each document's
    * surviving text is reassembled in order. Chunks travel as the
    * engine-portable 63-bit md5 keys (the [[qSubstringDedup]]
    * convention — identical collisions on both engines).
    *
    * Scale shape: one posexplode at the scan, ONE shuffle on the chunk
    * hash (min-struct over an unordered hash window — no per-group sort;
    * same single-branch rationale as [[qBoilerplateSpans]]: a
    * groupBy+join-back would re-evaluate the interpreted chunk transform
    * in two plan branches), one shuffle back on doc_id for reassembly.
    * Linear in corpus size; a corpus-hot chunk (ubiquitous boilerplate)
    * concentrates its occurrences in one window partition, but the
    * buffered rows are slim (id, pos, hash) and WindowExec spills — the
    * same bounded exposure [[qBoilerplateSpans]]'s count-over-window
    * carries, adjudicated acceptable there. */
  def qSentenceDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(col("text")).as("w"))
    val chunks = docs
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(w) - 1) div 10), i -> concat_ws(' ', slice(w, i * 10 + 1, 10)))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_no"), col("col").as("chunk"))
      .withColumn("gram_h", shiftrightunsigned(graft.functions.GraftFunctions
        .md5Hash64Array(array(col("chunk"))).getItem(0), 1))
    val flagged = chunks
      .withColumn("first",
        min(struct(col("doc_id"), col("chunk_no"))).over(Window.partitionBy("gram_h")))
      .withColumn("kept",
        col("first.doc_id") === col("doc_id") && col("first.chunk_no") === col("chunk_no"))
    flagged.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN struct(chunk_no, chunk) END)), s -> s.chunk)"))
          .as("kept_text"))
      .orderBy("doc_id")
  }

  /** Dedup-aware train/val/test splitting: every doc gets a deterministic
    * 80/10/10 split from the engine-portable md5 id hash (the
    * [[qStratifiedSample]] contract — re-runs and other engines assign
    * identically, no RNG), and docs with a Jaccard≥0.5 near-dup in a
    * DIFFERENT split are flagged leaky — the eval-contamination failure
    * mode naive random splitting ships (the val doc whose near-copy sits
    * in train), and the reason split assignment must be dedup-aware.
    * Downstream policy is the caller's (move the pair to one side, or
    * drop it); the operator's job is the flag.
    *
    * Scale shape: the split label is a narrow codegen'd map at the scan;
    * the near-dup pairs come from the session-cached mine
    * ([[graft.dedup.DedupOps.cachedJaccardPairs]] — the dedup_clusters
    * precedent, so this entry prices the SPLIT CHECK, not a re-mine),
    * and the leak check is two broadcast-able joins of the tiny pair
    * list against the label frame plus one broadcast flag join back. */
  def qTrainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = shiftrightunsigned(graft.functions.GraftFunctions
      .md5Hash64Array(array(col("doc_id").cast("string"))).getItem(0), 8) % 100
    val lab = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
    val pairs = graft.dedup.DedupOps.cachedJaccardPairs(spark, dir)
    val cross = pairs
      .join(lab.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(lab.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    val leaky = cross.select(col("doc_a").as("doc_id"))
      .unionByName(cross.select(col("doc_b").as("doc_id")))
      .distinct()
      .withColumn("leak", lit(true))
    lab.join(leaky, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        coalesce(col("leak"), lit(false)).as("is_leaky"))
      .orderBy("doc_id")
  }

  /** Metadata mutual-information audit: pointwise MI between the corpus's
    * language and source columns — the sampling-bias check a pipeline
    * runs before trusting per-language statistics (a source that ships
    * only one language makes lang-conditioned metrics confounded;
    * independent metadata → PMI ≈ 0 everywhere). Per (lang, source)
    * cell: the joint count and pmi = ln(n_ls·N / (n_l·n_s)) quantized to
    * integer MICRONATS (the perplexity precedent), plus the cell's
    * contribution n_ls·pmi to N·MI — so Σ contrib / N is the corpus MI
    * and every value is bit-portable.
    *
    * Scale shape: ONE map-side-combined groupBy(lang, source) over the
    * scan; marginals and the total re-aggregate the cell frame itself
    * (cells ≤ |langs|·|sources| — metadata-sized), broadcast back. The
    * corpus is touched once. */
  def qLangSourceMi(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n_ls"))
    val langM = cells.groupBy("lang").agg(sum("n_ls").as("n_l"))
    val srcM = cells.groupBy("source").agg(sum("n_ls").as("n_s"))
    val total = cells.agg(sum("n_ls").as("n"))
    cells.join(broadcast(langM), "lang")
      .join(broadcast(srcM), "source")
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_ls"),
        round(log(col("n_ls").cast("double") * col("n").cast("double") /
          (col("n_l").cast("double") * col("n_s").cast("double"))) * 1e6)
          .cast("long").as("pmi_unat"))
      .withColumn("contrib_unat", (col("n_ls") * col("pmi_unat")).cast("long"))
      .orderBy("lang", "source")
  }

}
