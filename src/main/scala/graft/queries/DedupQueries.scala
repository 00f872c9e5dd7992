package graft.queries

import graft.core.Checkpoints.StableOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Tokenizer
import graft.operators.{Dedup, TextAnalysis}

/** Deduplication query coverage (north-star training-data ops): exact,
  * fingerprint, blocked n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Exact / fingerprint / pairwise-Jaccard have full DuckDB oracles. The
  * LSH families are *approximate by construction* (recall depends on the
  * hash family), so their oracle is omitted — their correctness evidence
  * is the DedupSpec recall tests against the exact pairs.
  */
object DedupQueries extends graft.QueryModule {

  private val JaccardThreshold = 0.3
  private val SpanK = 5

  /** Exact dedup: hash-groupBy on content digest; one group per distinct
    * text, keeper = min doc_id (reference dedup J1 build side,
    * base_pipeline.py:169-174, generalized to content identity). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")
      .groupBy(md5(encode(col("text"), "UTF-8")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Fingerprint dedup: rolling polynomial hash of the first 32 tokens as
    * a cheap near-identity key (prefix-stable edits collide). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")
      .groupBy(TextAnalysis.fingerprint(col("text"), 32).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Exact blocked 3-gram Jaccard via the grouped inverted index
    * ([[Dedup.ngramJaccardPairs]]): one postings groupBy instead of a
    * two-sided shingle self-join; identical output to the naive all-pairs
    * + array_intersect formulation (136 s -> ~2 s at sf0.1). Hot shingles
    * above the df cap are dropped WITH an observed-metric count (the cap
    * never triggers at test scale — max df is 14 at sf0.1 — it exists for
    * the 100 TB near-stopword case). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", "lang", k = 3, threshold = JaccardThreshold)

  private val HistMinSim = 0.05

  /** Near-dup similarity histogram — the threshold-tuning curve: bucket
    * every candidate pair's exact 3-gram Jaccard into 0.05 bins and
    * report per-bin pair counts plus the cumulative count at-or-above
    * each bin (= how many pairs a given dedup threshold would merge).
    * Run BEFORE committing to a threshold on a new corpus; the curve's
    * knee is where near-dup structure separates from chance overlap.
    * Same inverted-index plan as [[ngramJaccard]] at a lower floor
    * ([[HistMinSim]]); the cumulative window runs over <= 21 bucket
    * rows — bounded by the binning, never by the corpus. */
  def simHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Dedup.ngramJaccardPairs(
      Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", "lang", k = 3, threshold = HistMinSim)
    val hist = pairs
      .select(floor(col("jaccard") * 20).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_pairs_ge", sum(col("n_pairs")).over(w))
      .select(col("bucket"), round(col("bucket") / 20.0, 2).as("sim_lo"),
        col("n_pairs"), col("n_pairs_ge"))
  }

  /** Containment near-dups (c / min(|A|, |B|) >= 0.5) — the excerpt/
    * quote-duplication detector: a short doc reproduced inside a long
    * one scores ~1.0 here while its Jaccard stays low (union dominated
    * by the long doc), so [[ngramJaccard]]'s threshold never fires.
    * Same inverted-index plan; emits the contained (smaller-set) member
    * as the drop candidate. */
  def containment(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairs(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", "lang", k = 3, threshold = 0.5)

  private[graft] val WinnowK = 4
  private[graft] val WinnowW = 4
  private val WinnowMinShared = 2
  private val WinnowDfCap = 256
  // expected winnow selection density 2/(w+1), 6-dp — ONE value
  // interpolated into both engines ([[winnowDensity]])
  private val WinnowTheoDensity =
    math.rint(2.0 / (WinnowW + 1) * 1e6) / 1e6

  /** Winnowing fingerprint near-dups ([[Dedup.winnowingPairs]]) — the
    * guaranteed-local-match sampled index: pairs sharing >= 2 selected
    * fingerprints, scored by shared / min fingerprint-set size. The
    * oracle replays the full scheme (ordered shingles -> XXH64 ->
    * flipped-domain window minima -> postings cap) in DuckDB. */
  def winnowing(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowingPairs(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", k = WinnowK, w = WinnowW,
      minShared = WinnowMinShared, dfCap = WinnowDfCap)

  /** Canonicalized ("fuzzy-exact") dedup — the standard web-corpus trick
    * that catches trivially-reformatted copies exact hashing misses:
    * lowercase, collapse every non-alphanumeric run to one space, trim,
    * then hash-groupBy the canonical form. Same plan shape as [[exact]]
    * (one digest shuffle); the canonicalization is a pure projection. */
  def canonical(spark: SparkSession, dir: String): DataFrame = {
    val canon = trim(regexp_replace(lower(col("text")),
      "[^\\p{L}\\p{N}]+", " "))
    Tables.loadSpread(spark, dir, "documents")
      .groupBy(md5(encode(canon, "UTF-8")).as("canonical_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Incremental (ingestion-time) dedup: a NEW batch (doc_id % 5 == 4,
    * the 20% "arriving" slice) deduped against the indexed corpus and
    * against itself in one pass — the shape of appending a crawl
    * snapshot to an existing 100 TB store. Corpus membership is a
    * digest-keyed left join (at scale: shuffle on the 16-byte digest,
    * never the text); in-batch first-wins is a min over the digest
    * group (bounded). Corpus duplication takes precedence over in-batch
    * duplication in the status. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digested = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("digest"))
    val existing = digested.filter(col("doc_id") % 5 =!= 4)
      .select(col("digest")).distinct().withColumn("in_corpus", lit(true))
    val batch = digested.filter(col("doc_id") % 5 === 4)
    batch
      .withColumn("first_id",
        min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .join(existing, Seq("digest"), "left")
      .select(col("doc_id"),
        when(col("in_corpus"), "dup_of_corpus")
          .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
          .otherwise("unique").as("status"))
  }

  /** MinHash+LSH near-dups: 32 hashes, 16 bands x 2 — candidates from band
    * buckets, verified by exact Jaccard >= 0.3. Only RECALL vs the full
    * pair set is approximate; the query itself is deterministic and
    * exactly oracled via [[graft.core.XxHashSql]]'s XXH64+fmix64 replay. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16,
      threshold = JaccardThreshold)

  /** MinHash sketch-quality audit: for every LSH candidate pair, the
    * Jaccard ESTIMATE from raw-signature component agreement
    * (matching minima / numHashes) next to the exact shingle Jaccard
    * and their absolute error — the report that sizes numHashes before
    * a full-corpus dedup run. Everything is deterministic given the
    * hash (the signature replays in DuckDB), so unlike a recall bound
    * this audit is hash-gated, not spec-bounded. Same shape as
    * [[minhashLsh]]: shingles persisted once, candidates from capped
    * band buckets, per-pair work bounded by the signature width. */
  def minhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    val withSh = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = withSh
      .withColumn("bands", Dedup.minhashBands(col("sh"), 32, 16))
      .withColumn("sig",
        graft.functions.TextFunctions.minhash_sig(col("sh"), lit(32)))
    val cands = Dedup.lshCandidates(withSig, "doc_id", "bands")
    val a = withSig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("sh").as("sh_a"))
    val b = withSig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("sh").as("sh_b"))
    val nEq = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
    val est = nEq.cast("double") / lit(32.0)
    val jac = Dedup.jaccard(col("sh_a"), col("sh_b"))
    val out = cands.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(est, 6).as("est_jaccard"),
        round(jac, 6).as("jaccard"),
        round(abs(est - jac), 6).as("abs_err"))
      .stableCheckpoint()
    withSh.unpersist(blocking = false)
    out
  }

  /** SimHash signatures per document (deterministic; pair query below).
    * Plain load, not loadSpread: at real scale the scan parallelizes by
    * file split, and here the forced round-robin would shuffle the full
    * text for a projection cheap enough to not need it (consumers that
    * prune the signature — e.g. a count — would pay the shuffle for
    * nothing). */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        Dedup.simhashText(col("text")).as("simhash"))

  /** SimHash near-dup pairs via 16-bit band blocking. The band scheme
    * GUARANTEES candidates only up to hamming 3 (4 bands, pigeonhole);
    * pairs at hamming 4-8 are found when at least one band happens to be
    * clean — best-effort, which empirically covers the planted near-dups
    * (true pairs at hamming 0-8, same-vocab background starts ~9). The
    * recall contract is the DedupSpec bound, not completeness. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", maxHamming = 8)

  /** Canonical cluster per document: connected components over the exact
    * near-dup pairs (keep-min-id semantics). Oracled — DuckDB computes
    * the same transitive closure with a recursive CTE. */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      ngramJaccard(spark, dir),
      Tables.load(spark, dir, "documents"), "doc_id")

  /** Pair/cluster tables shared by the AUDIT-tier entries
    * (`dedup_cluster_best`, `dedup_split_leakage`, `dedup_group_split`).
    * Each is a standalone catalog entry, but all three sit on top of the
    * same Jaccard+CC pipeline — a production dedup pipeline materializes
    * the cluster table once and audits it; this cache reproduces that
    * shape instead of re-mining pairs per entry. First consumer computes
    * and eagerly localCheckpoints (lineage cut; both tables are linear
    * in docs — pairs above threshold + one cluster label per doc), later
    * consumers reuse. Keyed by (session, dir): input dirs are immutable
    * (TESTDATA contract), and a new session never sees another session's
    * blocks. The PRIMARY entries (`dedup_ngram_jaccard`,
    * `dedup_clusters`) stay uncached so their bench timings keep
    * measuring the real pipeline. */
  // Shared via graft.core.DfCache (one home for the putIfAbsent /
  // recursive-update discipline — the clusters builder calls
  // cachedPairs, the exact hazard case).
  private def cachedPairs(spark: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.cached(spark, dir, "dedup:pairs")(
      ngramJaccard(spark, dir))
  private def cachedClusters(spark: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.cached(spark, dir, "dedup:clusters")(
      Dedup.connectedComponents(cachedPairs(spark, dir),
        Tables.load(spark, dir, "documents"), "doc_id"))

  /** Near-dup survivorship: per cluster, the representative to KEEP —
    * longest text wins, ties to the smallest doc_id (the standard
    * "keep the richest copy" curation rule; every other member is the
    * drop set). The argmax is a map-side-combinable `max(struct)` over
    * the (n_chars, -doc_id) order — no window, no per-cluster sort; the
    * doc join rides the same doc_id shuffle the cluster labels already
    * carry. */
  def clusterBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    cachedClusters(spark, dir).join(docs, "doc_id")
      .groupBy(col("cluster"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id")))
          .as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), (-col("best.neg_id")).as("keep_id"),
        col("best.n_chars").as("keep_chars"), col("n_members"))
  }

  /** Cross-split near-duplicate leakage: exact-Jaccard near-dup pairs
    * whose members land in DIFFERENT train/val/test splits — the "is my
    * eval set contaminated by paraphrases of training docs" audit. The
    * split is a pure hash of doc_id (the ta_split rule), so labeling the
    * pair table is a zero-join projection on top of the inverted-index
    * pair plan. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    cachedPairs(spark, dir)
      .withColumn("split_a", graft.core.SplitHash.splitCol(col("doc_a")))
      .withColumn("split_b", graft.core.SplitHash.splitCol(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))

  /** Leakage-safe split — [[splitLeakage]]'s constructive counterpart:
    * every document inherits the train/val/test assignment of its
    * near-dup CLUSTER label (the [[nearDupClusters]] min-id component)
    * instead of its own id, so a paraphrase pair can never straddle
    * splits — the leakage audit on this split is empty by construction.
    * Group-wise splitting is the standard fix for eval contamination in
    * corpus curation. Cost over the plain `ta_split` hash is exactly the
    * cluster labeling, which a dedup pipeline has already computed; the
    * assignment itself stays a pure hash projection over the cluster id
    * (the shared [[graft.core.SplitHash]] rule, so the 80/10/10 fractions
    * and salt cannot drift from the per-doc split). */
  def groupSplit(spark: SparkSession, dir: String): DataFrame =
    cachedClusters(spark, dir)
      .withColumn("split", graft.core.SplitHash.splitCol(col("cluster")))

  /** Duplicate-aware sampling weights — the "down-weight instead of
    * drop" curation rule: every near-dup cluster member is KEPT but
    * trains at weight 1/|cluster|, so duplicated content contributes one
    * document's worth of gradient signal in expectation regardless of
    * how many copies the crawl picked up. Rides the shared cluster
    * table ([[cachedClusters]]); the size attach is one bounded groupBy
    * + a cluster-keyed join — both linear, both on the cluster shuffle
    * the labels already carry. */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val cl = cachedClusters(spark, dir)
    val sizes = cl.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    cl.join(sizes, "cluster")
      .select(col("doc_id"), col("cluster"), col("n_members"),
        round(lit(1.0) / col("n_members"), 9).as("weight"))
  }

  /** Corpus-health report: per source, the exact-duplicate rate
    * (1 - distinct digests / docs) and the near-duplicate rate (docs in
    * a cluster of size >= 2) — the per-crawl dashboard numbers a
    * curation pipeline watches to catch a broken scraper or a
    * boilerplate-heavy source before training on it. One digest
    * aggregation + the shared cluster table; output is source-sized. */
  def ratesBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
    val cl = cachedClusters(spark, dir)
    val sizes = cl.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    val flags = cl.join(sizes, "cluster")
      .select(col("doc_id"), (col("n_members") > 1).cast("int").as("is_near"))
    docs.join(flags, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("digest")).as("n_distinct"),
        sum(col("is_near")).as("n_neardup"))
      .select(col("source"), col("n_docs"),
        round((col("n_docs") - col("n_distinct")).cast("double")
          / col("n_docs"), 9).as("exact_dup_rate"),
        round(col("n_neardup").cast("double") / col("n_docs"), 9)
          .as("neardup_rate"))
  }

  /** Effective source mix AFTER duplicate down-weighting — what the
    * training mix actually looks like once every near-dup cluster
    * contributes one document's worth of signal ([[dedupWeights]]): per
    * source, raw vs effective doc and token counts and the corpus-share
    * drift. A source whose share collapses here is padding the corpus
    * with copies (the complement of [[ratesBySource]]'s rate view).
    * Token counts via the oracled C4 expression; one doc-keyed join
    * rides the cluster shuffle, the final agg is source-sized. */
  def dedupAwareMix(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.count_tokens(col("text"))
          .cast("long").as("n_tokens"))
    val w = dedupWeights(spark, dir).select(col("doc_id"), col("weight"))
    // DECIMAL sums: exact and order-independent, so the oracle compare
    // never flakes on double summation order (repo convention)
    val wDec = col("weight").cast(org.apache.spark.sql.types.DecimalType(18, 9))
    val per = toks.join(w, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("raw_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        round(sum(wDec).cast("double"), 6).as("eff_docs"),
        round(sum(wDec * col("n_tokens")).cast("double"), 6).as("eff_tokens"))
    val tot = per.agg(sum(col("raw_tokens")).as("t_raw"),
      sum(col("eff_tokens")).as("t_eff"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("raw_docs"), col("raw_tokens"),
        col("eff_docs"), col("eff_tokens"),
        round(col("raw_tokens") / col("t_raw"), 6).as("raw_share"),
        round(col("eff_tokens") / col("t_eff"), 6).as("eff_share"))
  }

  /** Stream-static incremental near-dups: streaming docs probed against
    * the static banded-MinHash corpus index; must equal the batch LSH
    * pairs on a bounded stream (DedupSpec parity). Approximate family —
    * rows-only driver check. */
  def streamingNearDups(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingNearDups(spark, dir,
      shingleK = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold)

  /** Ingestion-time curation gate (streaming): arriving docs (the
    * `dedup_incremental` batch convention, doc_id % 5 == 4) classified
    * against static corpus state — digest dup probe + per-language
    * 25th-percentile quality threshold; admits carry the hash split.
    * Stateless stream-static plan; see
    * [[graft.streaming.StreamingOps.streamingCuration]]. */
  def streamingCuration(spark: SparkSession, dir: String): DataFrame = {
    // static corpus state, DfCached: an ingestion gate holds ONE digest
    // set + threshold table across many micro-batches (refreshed by the
    // periodic batch manifest), so min-of-reps measures that steady
    // state rather than re-deriving both tables per invocation
    def corpus = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 5 =!= 4)
    val corpusDigests = graft.core.DfCache.cached(spark, dir,
        "stream:curation_digests") {
      corpus.select(md5(encode(col("text"), "UTF-8")).as("digest"))
        .distinct().withColumn("in_corpus", lit(true))
    }
    val thresholds = graft.core.DfCache.cached(spark, dir,
        "stream:curation_thr") {
      AnalysisQueries.qualityPctOf(corpus)
        .filter(col("pct") >= 0.25)
        .groupBy(col("lang")).agg(min(col("quality")).as("thr"))
    }
    graft.streaming.StreamingOps.streamingCuration(
      spark, dir, corpusDigests, thresholds)
  }

  /** Winnowing density audit — the index-health check for
    * [[winnowing]]: per source, the observed fraction of shingle
    * windows that contribute a (distinct) selected fingerprint, against
    * the scheme's 2/(w+1) expected selection density (Schleimer/
    * Wilkerson/Aiken, SIGMOD'03 §5 — observed sits at or under it
    * because repeated selections collapse in the distinct set). A
    * source whose density collapses far below the bound is
    * template-heavy (few distinct windows — the index underselects
    * exactly where near-dup recall matters); one at the bound is
    * healthy. Pure integer sums per doc (fingerprint count, window
    * count) aggregated per source, one pointwise division at the end —
    * bit-replayable through the shared winnow CTE chain. */
  def winnowDensity(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.functions.TextFunctions
    val perDoc = Tables.loadSpread(spark, dir, "documents")
      .select(col("source"),
        tf.count_tokens(col("text")).cast("long").as("nt"),
        size(tf.winnow_fingerprints(col("text"),
          lit(WinnowK), lit(WinnowW))).cast("long").as("n_fp"))
      // windows = (nt - k + 1) - w + 1; docs below the k+w-1 token
      // floor have no windows (the kernel returns an empty array)
      .withColumn("n_windows", col("nt") - lit(WinnowK + WinnowW - 2))
      .filter(col("n_windows") > 0)
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("total_windows"),
        sum(col("n_fp")).as("total_fps"))
      .select(col("source"), col("n_docs"), col("total_windows"),
        col("total_fps"),
        round(col("total_fps").cast("double") /
          col("total_windows").cast("double"), 6).as("density"),
        lit(WinnowTheoDensity).as("theoretical"))
  }

  /** Substring-level dedup: maximal per-doc runs of 5-grams that occur
    * in more than one document ([[Dedup.duplicatedSpans]] — the
    * exact-substring-dedup span report). Linear end-to-end; the islands
    * merge is the only per-doc window. */
  def duplicatedSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", k = SpanK)

  /** Duplicated-content fraction per document — the "drop docs that are
    * mostly shared text" curation filter built on [[Dedup.spanCoverage]]
    * (distinct covered token positions, so overlaps never
    * double-count). */
  def spanCoverage(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanCoverage(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", k = SpanK)

  /** The actual substring-dedup TRANSFORMATION ([[Dedup.spanRewrite]]):
    * every document rewritten with cross-doc duplicated 5-gram spans
    * removed, global first occurrence kept — the cleaned corpus the span
    * report above is the audit for. */
  def spanRewrite(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanRewrite(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", k = SpanK)

  /** End-to-end curation manifest — the whole dedup+quality pipeline as
    * ONE declarative plan, one row per document with its fate and why:
    *
    *  1. `drop_exact_dup` — not the min-id keeper of its md5(text) group
    *     (hash groupBy on a 16-byte digest; the text never shuffles);
    *  2. `drop_near_dup` — its near-dup cluster (shared audit-tier
    *     cluster cache) keeps a richer member (longest text, ties to
    *     min id, computed among exact-keepers only via map-side-combined
    *     `max(struct)` — every cluster retains >= 1 exact keeper because
    *     identical texts always share a cluster);
    *  3. `drop_quality` — below its own language's 25th quality
    *     percentile (the [[AnalysisQueries.qualityPct]] distribution-
    *     cell rank — no global window);
    *  4. `keep` — with the leakage-safe split: keepers inherit
    *     [[graft.core.SplitHash]] of their CLUSTER id (the
    *     `dedup_group_split` rule), so a kept doc can never land in a
    *     different split than a near-dup of itself kept by a later
    *     incremental run.
    *
    * Every stage is keyed-shuffle or broadcast — the composition adds no
    * new shuffle shape beyond its parts, so the 100 TB posture is the
    * min of its parts'. First match wins on status. */
  def curationManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("ch"))
    val ex = hashed.join(
      hashed.groupBy(col("ch")).agg(min(col("doc_id")).as("ex_keep")), "ch")
      .select(col("doc_id"), col("ex_keep"))
    val cl = cachedClusters(spark, dir)
    val best = cl
      .join(ex.filter(col("doc_id") === col("ex_keep")).select("doc_id"), "doc_id")
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("b"))
      .select(col("cluster"), (-col("b.neg_id")).as("cl_keep"))
    val pct = AnalysisQueries.qualityPct(spark, dir)
      .select(col("doc_id"), col("pct"))
    val status = when(col("doc_id") =!= col("ex_keep"), "drop_exact_dup")
      .when(col("doc_id") =!= col("cl_keep"), "drop_near_dup")
      .when(col("pct") < 0.25, "drop_quality")
      .otherwise("keep")
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(ex, "doc_id")
      .join(cl, "doc_id")
      // LEFT: a cluster can lack a best when ALL its members are exact
      // drops — possible because the near-dup pair table is lang-blocked,
      // so a doc whose identical text also ships under another lang label
      // keeps its own cluster while losing the md5 race. The status CASE
      // classifies such docs as drop_exact_dup before touching cl_keep,
      // and genuine keeps always have a best (their own cluster keeps
      // them), so the null never reaches a decision.
      .join(best, Seq("cluster"), "left")
      .join(pct, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        col("cluster"), status.as("status"),
        when(status === "keep",
          graft.core.SplitHash.splitCol(col("cluster"))).as("split"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_neardup_join" -> streamingNearDups,
    "stream_curation" -> streamingCuration,
    "dedup_curation_manifest" -> curationManifest,
    "dedup_spans" -> duplicatedSpans,
    "dedup_span_coverage" -> spanCoverage,
    "dedup_span_rewrite" -> spanRewrite,
    "dedup_exact" -> exact,
    "dedup_canonical" -> canonical,
    "dedup_incremental" -> incremental,
    "dedup_fingerprint" -> fingerprint,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_sim_histogram" -> simHistogram,
    "dedup_clusters" -> nearDupClusters,
    "dedup_cluster_best" -> clusterBest,
    "dedup_split_leakage" -> splitLeakage,
    "dedup_group_split" -> groupSplit,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_minhash_est" -> minhashEstimate,
    "dedup_simhash" -> simhash,
    "dedup_simhash_pairs" -> simhashPairs,
    "dedup_weights" -> dedupWeights,
    "dedup_rates_by_source" -> ratesBySource,
    "dedup_containment" -> containment,
    "dedup_winnowing" -> winnowing,
    "dedup_winnow_density" -> winnowDensity,
    "ta_dedup_aware_mix" -> dedupAwareMix,
  )

  private val re = Tokenizer.DuckDbTokenRegex
  private def splitCase(idCol: String): String =
    graft.core.SplitHash.splitSql(idCol)

  /** Shared shingle CTE body (3-gram distinct shingles per doc). */
  private[graft] lazy val ShingleCte =
    s"""sh AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN len(ts) >= 3 THEN list_distinct(
       |      [array_to_string(list_slice(ts, i, i + 2), ' ')
       |       for i in range(1, len(ts) - 2 + 1)])
       |    ELSE [] END AS sh
       |  FROM (SELECT doc_id, lang, regexp_extract_all(text, '$re') AS ts
       |        FROM documents)
       |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_canonical" ->
      """SELECT md5(trim(regexp_replace(lower(text),
        |    '[^\p{L}\p{N}]+', ' ', 'g'))) AS canonical_hash,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |e AS (SELECT DISTINCT digest FROM d WHERE doc_id % 5 <> 4),
        |b AS (SELECT doc_id, digest FROM d WHERE doc_id % 5 = 4),
        |m AS (SELECT digest, min(doc_id) AS first_id FROM b GROUP BY 1)
        |SELECT b.doc_id,
        |  CASE WHEN e.digest IS NOT NULL THEN 'dup_of_corpus'
        |       WHEN b.doc_id <> m.first_id THEN 'dup_in_batch'
        |       ELSE 'unique' END AS status
        |FROM b LEFT JOIN e ON b.digest = e.digest
        |JOIN m ON b.digest = m.digest""".stripMargin,
    "dedup_fingerprint" ->
      s"""WITH nums AS (
         |  SELECT doc_id, list_transform(
         |    list_slice(regexp_extract_all(text, '$re'), 1, 32),
         |    t -> CAST(ascii(t) + length(t) * 7 AS BIGINT)) AS xs
         |  FROM documents
         |)
         |SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint,
         |  min(doc_id) AS keep_id, count(*) AS n_docs
         |FROM nums GROUP BY 1""".stripMargin,
    "dedup_span_rewrite" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(text, '$re') AS ts
         |  FROM documents
         |),
         |grams AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $SpanK + 2)) AS pos, ts
         |  FROM toks WHERE len(ts) >= $SpanK
         |),
         |g2 AS (
         |  SELECT doc_id, pos,
         |    array_to_string(list_slice(ts, pos, pos + ${SpanK - 1}), ' ') AS g
         |  FROM grams
         |),
         |dposn AS (
         |  SELECT DISTINCT doc_id, unnest(range(pos, pos + $SpanK)) AS tpos
         |  FROM (
         |    SELECT doc_id, pos,
         |      min(doc_id) OVER (PARTITION BY g) AS own,
         |      max(doc_id) OVER (PARTITION BY g) AS mx
         |    FROM g2) WHERE own <> mx AND doc_id <> own
         |),
         |tok AS (
         |  SELECT doc_id, generate_subscripts(ts, 1) AS tpos,
         |    unnest(ts) AS tok
         |  FROM toks
         |),
         |kept AS (
         |  SELECT t.doc_id, count(*) AS kept_tokens,
         |    array_to_string(list(t.tok ORDER BY t.tpos), ' ') AS text_dedup
         |  FROM tok t LEFT JOIN dposn d
         |    ON t.doc_id = d.doc_id AND t.tpos = d.tpos
         |  WHERE d.doc_id IS NULL
         |  GROUP BY t.doc_id
         |)
         |SELECT toks.doc_id, CAST(len(toks.ts) AS BIGINT) AS n_tokens,
         |  coalesce(kept.kept_tokens, 0) AS kept_tokens,
         |  coalesce(kept.text_dedup, '') AS text_dedup
         |FROM toks LEFT JOIN kept ON toks.doc_id = kept.doc_id""".stripMargin,
    "dedup_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(text, '$re') AS ts
         |  FROM documents
         |),
         |occ AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $SpanK + 2)) AS pos, ts
         |  FROM toks WHERE len(ts) >= $SpanK
         |),
         |grams AS (
         |  SELECT doc_id, pos,
         |    array_to_string(list_slice(ts, pos, pos + ${SpanK - 1}), ' ') AS g
         |  FROM occ
         |),
         |dpos AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      min(doc_id) OVER (PARTITION BY g)
         |        <> max(doc_id) OVER (PARTITION BY g) AS dup
         |    FROM grams) WHERE dup
         |),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM dpos
         |)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
         |  count(*) AS n_grams, count(*) + ${SpanK - 1} AS span_tokens
         |FROM isl GROUP BY doc_id, grp""".stripMargin,
    "dedup_span_coverage" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(text, '$re') AS ts
         |  FROM documents
         |),
         |occ AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $SpanK + 2)) AS pos, ts
         |  FROM toks WHERE len(ts) >= $SpanK
         |),
         |grams AS (
         |  SELECT doc_id, pos,
         |    array_to_string(list_slice(ts, pos, pos + ${SpanK - 1}), ' ') AS g
         |  FROM occ
         |),
         |dpos AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      min(doc_id) OVER (PARTITION BY g)
         |        <> max(doc_id) OVER (PARTITION BY g) AS dup
         |    FROM grams) WHERE dup
         |),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT tpos) AS dup_tokens FROM (
         |    SELECT doc_id, unnest(range(pos, pos + $SpanK)) AS tpos
         |    FROM dpos) GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CASE WHEN len(t.ts) = 0 THEN 0.0
         |    ELSE round(coalesce(c.dup_tokens, 0) * 1.0 / len(t.ts), 6)
         |  END AS dup_frac
         |FROM toks t LEFT JOIN cov c USING (doc_id)""".stripMargin,
    "dedup_sim_histogram" ->
      s"""WITH $ShingleCte,
         |$PairCte,
         |p AS (SELECT round(c * 1.0 / u, 6) AS jaccard FROM jp
         |  WHERE c * 1.0 / u >= $HistMinSim),
         |h AS (SELECT CAST(floor(jaccard * 20) AS INT) AS bucket,
         |    count(*) AS n_pairs
         |  FROM p GROUP BY 1)
         |SELECT bucket, round(bucket / 20.0, 2) AS sim_lo, n_pairs,
         |  CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_pairs_ge
         |FROM h""".stripMargin,
    "dedup_winnowing" -> graft.core.XxHashSql.winnowingPairsSql(
      re, WinnowK, WinnowW, WinnowMinShared, WinnowDfCap),
    // fingerprint-count replay of the same winnow chain (ordered
    // shingles -> XXH64 -> flipped-domain window minima -> distinct),
    // reduced to per-doc counts + per-source density
    "dedup_winnow_density" ->
      s"""WITH wt AS (
         |  SELECT doc_id, source, regexp_extract_all(text, '$re') AS ts
         |  FROM documents),
         |wsh AS (
         |  SELECT doc_id, len(ts) AS nt,
         |    [array_to_string(list_slice(ts, i, i + ${WinnowK - 1}), ' ')
         |     for i in range(1, len(ts) - $WinnowK + 2)] AS ss
         |  FROM wt WHERE len(ts) >= ${WinnowK + WinnowW - 1}),
         |wdis AS (SELECT DISTINCT 0 AS doc_id, t
         |  FROM (SELECT unnest(ss) AS t FROM wsh)),
         |${graft.core.XxHashSql.hash64Ctes("wdis", "whash", "wdx")},
         |wpos AS (SELECT doc_id, unnest(ss) AS t,
         |    unnest(range(1, len(ss) + 1)) AS pos FROM wsh),
         |whl AS (SELECT p.doc_id,
         |    list(xor(h.h64, 9223372036854775808::UBIGINT)
         |      ORDER BY p.pos) AS hs
         |  FROM wpos p JOIN whash h ON p.t = h.t GROUP BY p.doc_id),
         |wfp AS (SELECT doc_id,
         |    len(list_distinct(
         |      [list_aggregate(list_slice(hs, j, j + ${WinnowW - 1}), 'min')
         |       for j in range(1, len(hs) - $WinnowW + 2)])) AS n_fp,
         |    len(hs) - $WinnowW + 1 AS n_windows
         |  FROM whl)
         |SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(f.n_windows) AS BIGINT) AS total_windows,
         |  CAST(sum(f.n_fp) AS BIGINT) AS total_fps,
         |  round(CAST(sum(f.n_fp) AS DOUBLE)
         |    / CAST(sum(f.n_windows) AS DOUBLE), 6) AS density,
         |  CAST($WinnowTheoDensity AS DOUBLE) AS theoretical
         |FROM wfp f JOIN wt s USING (doc_id)
         |GROUP BY s.source""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $ShingleCte,
         |$PairCte
         |SELECT doc_a, doc_b, round(c * 1.0 / u, 6) AS jaccard
         |FROM jp WHERE c * 1.0 / u >= $JaccardThreshold""".stripMargin,
    "dedup_split_leakage" ->
      s"""WITH $ShingleCte,
         |$PairCte,
         |pr AS (SELECT doc_a, doc_b, round(c * 1.0 / u, 6) AS jaccard
         |  FROM jp WHERE c * 1.0 / u >= $JaccardThreshold)
         |SELECT doc_a, doc_b, jaccard, ${splitCase("doc_a")} AS split_a,
         |  ${splitCase("doc_b")} AS split_b
         |FROM pr
         |WHERE ${splitCase("doc_a")} <> ${splitCase("doc_b")}""".stripMargin,
    "dedup_clusters" ->
      s"WITH RECURSIVE $ClusterCtes\nSELECT doc_id, cluster FROM cl",
    "dedup_group_split" ->
      s"""WITH RECURSIVE $ClusterCtes
         |SELECT doc_id, cluster, ${splitCase("cluster")} AS split
         |FROM cl""".stripMargin,
    "dedup_cluster_best" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |j AS (SELECT c.cluster, c.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
         |  FROM cl c JOIN documents d USING (doc_id)),
         |nm AS (SELECT cluster, count(*) AS n_members FROM cl GROUP BY 1)
         |SELECT j.cluster, j.doc_id AS keep_id, j.n_chars AS keep_chars,
         |  nm.n_members
         |FROM j JOIN nm USING (cluster) WHERE j.rn = 1""".stripMargin,
    // the signature itself is deterministic (only pair RECALL is
    // approximate) — replayed bit-for-bit via the single-sourced
    // murmur3-over-UTF-8 SQL in TokenHash (generated CTE chain)
    "dedup_simhash" -> graft.core.TokenHash.simhashDocumentsSql(re),
    // candidate generation + verify are deterministic given the
    // signatures, so the pairs query gets an exact oracle too; only its
    // recall vs ALL true near-dups is approximate (DedupSpec bound)
    "dedup_simhash_pairs" -> graft.core.TokenHash.simhashPairsSql(re, 8),
    // same status as the simhash pairs: the banded-MinHash candidate set
    // and the exact-Jaccard verify are both deterministic given the hash,
    // and XxHashSql replays XXH64 + fmix64 bit-for-bit in DuckDB. The
    // kernel's 1000-doc hot-bucket cap is part of the replayed contract.
    "dedup_minhash_lsh" -> graft.core.XxHashSql.minhashPairsSql(
      re, shingleK = 3, numHashes = 32, bands = 16,
      threshold = JaccardThreshold, bucketCap = Some(1000)),
    // sketch-error audit: the same replayed signature, compared
    // component-wise (mmin) against the exact shingle Jaccard per
    // candidate pair
    // rides the SAME verify chain as the lsh/neardup oracles (mver
    // carries the exact jaccard; the capped candidate set is its
    // in_capped subset) — only the 32-row-per-pair signature agreement
    // is computed here
    "dedup_minhash_est" ->
      s"""WITH ${graft.core.XxHashSql.minhashBandCtes(re, 3, 32, 16)},
         |${graft.core.XxHashSql.minhashVerifyCtes(
          graft.core.XxHashSql.CappedBucketLimit)},
         |magree AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_eq
         |  FROM (SELECT doc_a, doc_b FROM mver WHERE in_capped) c
         |  JOIN mmin a ON a.doc_id = c.doc_a
         |  JOIN mmin b ON b.doc_id = c.doc_b AND a.j = b.j
         |  GROUP BY 1, 2)
         |SELECT g.doc_a, g.doc_b,
         |  round(g.n_eq / 32.0, 6) AS est_jaccard,
         |  round(v.jaccard, 6) AS jaccard,
         |  round(abs(g.n_eq / 32.0 - v.jaccard), 6) AS abs_err
         |FROM magree g
         |JOIN mver v ON v.doc_a = g.doc_a AND v.doc_b = g.doc_b""".stripMargin,
    // the streaming variant joins band collisions directly (no bucket
    // cap); batch-replaying it is exact for the same reason
    "stream_neardup_join" -> graft.core.XxHashSql.minhashPairsSql(
      re, shingleK = 3, numHashes = 32, bands = 16,
      threshold = JaccardThreshold, bucketCap = None),
    // batch replay of the stateless stream-static gate: statuses depend
    // only on static corpus state, so micro-batching cannot reorder them
    "stream_curation" ->
      s"""WITH ${graft.queries.AnalysisQueries.qualityFeatureCtes},
         |q2 AS (SELECT f.doc_id, d.lang, d.source,
         |  ${graft.queries.AnalysisQueries.qualityScoreSql} AS quality
         |  FROM f JOIN documents d ON f.doc_id = d.doc_id),
         |cthr AS (SELECT lang, min(quality) AS thr FROM (
         |  SELECT lang, quality, round(percent_rank() OVER
         |    (PARTITION BY lang ORDER BY quality), 6) AS pct
         |  FROM q2 WHERE doc_id % 5 <> 4) WHERE pct >= 0.25 GROUP BY lang),
         |cd AS (SELECT DISTINCT md5(text) AS digest FROM documents
         |       WHERE doc_id % 5 <> 4),
         |bq AS (SELECT q2.doc_id, q2.lang, q2.source, q2.quality,
         |  md5(d.text) AS digest
         |  FROM q2 JOIN documents d ON d.doc_id = q2.doc_id
         |  WHERE q2.doc_id % 5 = 4),
         |st2 AS (SELECT bq.doc_id, bq.lang, bq.source, bq.quality,
         |  CASE WHEN cd.digest IS NOT NULL THEN 'dup_of_corpus'
         |       WHEN bq.quality < t.thr THEN 'low_quality'
         |       ELSE 'admit' END AS status
         |  FROM bq LEFT JOIN cd ON cd.digest = bq.digest
         |  LEFT JOIN cthr t ON t.lang = bq.lang)
         |SELECT doc_id, lang, source, quality, status,
         |  CASE WHEN status = 'admit' THEN ${splitCase("doc_id")} END AS split
         |FROM st2""".stripMargin,
    "dedup_curation_manifest" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |${graft.queries.AnalysisQueries.qualityFeatureCtes},
         |qq AS (SELECT f.doc_id, d.lang,
         |  ${graft.queries.AnalysisQueries.qualityScoreSql} AS quality
         |  FROM f JOIN documents d ON f.doc_id = d.doc_id),
         |rr AS (SELECT doc_id, round(percent_rank() OVER
         |    (PARTITION BY lang ORDER BY quality), 6) AS pct FROM qq),
         |ex AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS ex_keep
         |       FROM documents),
         |bst AS (SELECT cluster, doc_id AS cl_keep FROM (
         |  SELECT cl.cluster, cl.doc_id, row_number() OVER
         |    (PARTITION BY cl.cluster ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id
         |  JOIN ex ON ex.doc_id = cl.doc_id
         |  WHERE ex.doc_id = ex.ex_keep) WHERE rn = 1),
         |st AS (
         |  SELECT d.doc_id, d.lang, d.source, cl.cluster,
         |    CASE WHEN e.doc_id <> e.ex_keep THEN 'drop_exact_dup'
         |         WHEN cl.doc_id <> b.cl_keep THEN 'drop_near_dup'
         |         WHEN r.pct < 0.25 THEN 'drop_quality'
         |         ELSE 'keep' END AS status
         |  FROM documents d
         |  JOIN ex e ON e.doc_id = d.doc_id
         |  JOIN cl ON cl.doc_id = d.doc_id
         |  LEFT JOIN bst b ON b.cluster = cl.cluster
         |  JOIN rr r ON r.doc_id = d.doc_id)
         |SELECT doc_id, lang, source, cluster, status,
         |  CASE WHEN status = 'keep' THEN ${splitCase("cluster")} END AS split
         |FROM st""".stripMargin,
    "dedup_weights" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |nm AS (SELECT cluster, count(*) AS n_members FROM cl GROUP BY 1)
         |SELECT cl.doc_id, cl.cluster, nm.n_members,
         |  round(CAST(1 AS DOUBLE) / nm.n_members, 9) AS weight
         |FROM cl JOIN nm USING (cluster)""".stripMargin,
    // predicate note: the original `na > 0 AND nb > 0 AND ratio >= 0.5`
    // admits exactly the c > 0 pairs jp holds (c = 0 forces ratio 0)
    "dedup_containment" ->
      s"""WITH $ShingleCte,
         |$PairCte
         |SELECT doc_a, doc_b,
         |  round(c * 1.0 / least(na, nb), 6) AS containment,
         |  CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_id
         |FROM jp
         |WHERE c * 1.0 / least(na, nb) >= 0.5""".stripMargin,
    "ta_dedup_aware_mix" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |nm AS (SELECT cluster, count(*) AS n_members FROM cl GROUP BY 1),
         |w AS (SELECT cl.doc_id,
         |    round(CAST(1 AS DOUBLE) / nm.n_members, 9) AS weight
         |  FROM cl JOIN nm USING (cluster)),
         |t AS (SELECT doc_id, source,
         |    len(regexp_extract_all(text, '$re')) AS n_tokens
         |  FROM documents),
         |per AS (SELECT t.source, count(*) AS raw_docs,
         |    CAST(sum(t.n_tokens) AS BIGINT) AS raw_tokens,
         |    round(CAST(sum(CAST(w.weight AS DECIMAL(18,9))) AS DOUBLE), 6)
         |      AS eff_docs,
         |    round(CAST(sum(CAST(w.weight AS DECIMAL(18,9)) * t.n_tokens)
         |      AS DOUBLE), 6) AS eff_tokens
         |  FROM t JOIN w USING (doc_id) GROUP BY t.source),
         |tot AS (SELECT sum(raw_tokens) AS t_raw, sum(eff_tokens) AS t_eff
         |  FROM per)
         |SELECT source, raw_docs, raw_tokens, eff_docs, eff_tokens,
         |  round(raw_tokens / t_raw, 6) AS raw_share,
         |  round(eff_tokens / t_eff, 6) AS eff_share
         |FROM per, tot""".stripMargin,
    "dedup_rates_by_source" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |nm AS (SELECT cluster, count(*) AS n_members FROM cl GROUP BY 1),
         |fl AS (SELECT cl.doc_id,
         |    CASE WHEN nm.n_members > 1 THEN 1 ELSE 0 END AS is_near
         |  FROM cl JOIN nm USING (cluster)),
         |d AS (SELECT doc_id, source, md5(text) AS digest FROM documents)
         |SELECT d.source, count(*) AS n_docs,
         |  round(CAST(count(*) - count(DISTINCT d.digest) AS DOUBLE)
         |    / count(*), 9) AS exact_dup_rate,
         |  round(CAST(sum(fl.is_near) AS DOUBLE) / count(*), 9)
         |    AS neardup_rate
         |FROM d JOIN fl USING (doc_id)
         |GROUP BY d.source""".stripMargin,
  )

  /** Shared candidate-pair CTE over `sh` ([[ShingleCte]]): every
    * same-lang doc pair with at least one shared shingle, carrying the
    * raw intersection/union/side counts every pair-family oracle
    * derives its measure from. Single-sourced so the gate's PRELUDE
    * (`g_jp` in [[graft.OraclePrelude]]) can materialize exactly this
    * text once per run instead of re-running the quadratic-in-block
    * join per oracle. */
  private[graft] lazy val PairCte =
    """jp AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.sh, b.sh)) AS c,
      |    len(list_distinct(a.sh || b.sh)) AS u,
      |    len(a.sh) AS na, len(b.sh) AS nb
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) > 0)""".stripMargin

  /** Shared transitive-closure CTEs for the cluster oracles: exact
    * Jaccard pairs -> recursive reachability -> min-label per doc;
    * `cl` is every document with its cluster id (singletons included).
    * MATERIALIZED because the survivorship oracle references `cl`
    * twice. Callers must open with `WITH RECURSIVE`. */
  private[graft] lazy val ClusterCtes =
    s"""$ShingleCte,
       |$PairCte,
       |p AS (
       |  SELECT doc_a, doc_b FROM jp
       |  WHERE c * 1.0 / u >= $JaccardThreshold),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |          UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |cl AS MATERIALIZED (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN labels l USING (doc_id))""".stripMargin
}
