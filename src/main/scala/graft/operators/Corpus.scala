package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TextFuncs}

/** Corpus-preparation operators for LLM training-data pipelines:
  * chunking, sequence packing, deterministic sampling and benchmark
  * decontamination. The reference has no analogue (it stops at
  * store + search); these are the steps between "deduped corpus"
  * and "training batches" at 100 TB.
  *
  * Scale shapes: chunking is map-only (explode fan-out, no shuffle);
  * packing is one window shuffle keyed by the group column;
  * sampling is a map-only filter; decontamination shuffles the
  * shingle stream (∝ corpus tokens, never doc×benchmark pairs).
  */
object Corpus {

  /** Split each document into overlapping token-window chunks:
    * chunk `i` covers tokens `[i*stride, i*stride + window)` (the
    * standard sliding-window prep for embedding / context-length
    * limits). Documents with fewer than `window` tokens yield one
    * short chunk; empty docs yield none. Map-only: the explode fans
    * each doc out to its `1 + ceil((n-window)/stride)` chunks.
    *
    * Output: (idCol, chunk_idx int, chunk string, n_tokens int).
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    // integer-exact chunk count (no fp ceil, which could disagree
    // with the oracle at exact multiples): for n > window it is
    // ((n - window + stride - 1) div stride) + 1; the greatest(1, _)
    // covers n <= window, where the div term is <= 0 in both engines
    // (trunc here, floor in DuckDB — both end below 1).
    val nc = expr(
      s"greatest(1L, ((size(_toks) - $window + ${stride - 1}) div $stride) + 1)")
    df.select(col(idCol), TextFuncs.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L), nc - 1)).as("_ci"))
      .withColumn("_chunk_toks",
        slice(col("_toks"), (col("_ci") * stride + 1).cast("int"), lit(window)))
      .select(col(idCol),
        col("_ci").cast("int").as("chunk_idx"),
        array_join(col("_chunk_toks"), " ").as("chunk"),
        size(col("_chunk_toks")).as("n_tokens"))
  }

  /** Concat-and-split sequence packing at document granularity — the
    * standard LLM pretraining prep (lay a group's documents end to
    * end in id order, cut every `budget` tokens): a document's pack
    * is `start div budget` where `start` is the running token count
    * before it within its group. One window shuffle keyed by
    * `groupCol`; at 100 TB the group column (source / shard) bounds
    * each window partition, and packs never cross groups.
    *
    * Output: one row per doc — (groupCol, idCol, n_tokens, start,
    * pack_id). Downstream aggregates by (groupCol, pack_id).
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(groupCol), col(idCol),
        size(TextFuncs.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start div $budget"))
  }

  /** Deterministic per-row hash in [0, 100): Knuth multiplicative
    * hash of the id, exact in long arithmetic in BOTH engines (the
    * id is folded mod 1000003 first so the multiply never exceeds
    * 2^63 — max 1000002 * 2654435761 ≈ 2.7e15). Sampling decisions
    * are reproducible across runs/engines, unlike rand(). */
  def hashMod100(id: Column): Column =
    pmod(pmod(pmod(id, lit(1000003L)) * lit(2654435761L),
      lit(4294967296L)), lit(100L))

  /** Stratified / weighted-mixture sampling: keep a row iff
    * hashMod100(id) < its stratum's percentage. Map-only filter;
    * rates per stratum express mixture weights (the "sample source A
    * at 37%, source B at 11%" knob of corpus mixing). */
  def sampleByRate(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.where(hashMod100(col(idCol)) < ratePct)

  /** Training docs that share at least one k-token shingle with the
    * benchmark set — the contamination check run before training.
    * Both sides explode to (shingle hash) streams and meet in an
    * equi join: shuffle ∝ token streams, never |train|×|bench|
    * pairs. Returns the distinct contaminated id column.
    */
  /** Cross-source leakage audit: for every source pair, how many
    * distinct k-token shingles they share — the matrix that tells a
    * corpus curator which "independent" sources are actually mirrors
    * of each other before mixture weights get set. The (shingle, src)
    * stream is DISTINCTed first (one hash-keyed shuffle, ∝ corpus
    * tokens), so the self-join's fan-out per shingle is bounded by
    * |sources| (not document frequency) — a hot shingle appearing in
    * a billion docs still contributes ≤ |sources|² join rows. Output
    * is |sources|²/2 rows.
    */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
      shingleK: Int): DataFrame = {
    val sh = docs.select(col(srcCol).as("src"),
        explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
    val a = sh.as("a"); val b = sh.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def contaminatedIds(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame = {
    val tSh = train.select(col(idCol),
      explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
    val bSh = bench
      .select(explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
    tSh.join(bSh, "sh").select(col(idCol)).distinct()
  }

  /** Graded decontamination: per train doc, the fraction of its
    * DISTINCT shingles found in the benchmark set, with a
    * keep/flag/drop verdict — real pipelines don't drop on ANY
    * overlap ([[decontaminate]]'s binary form): a stray idiom shared
    * with a benchmark question shouldn't cost a whole document, while
    * a doc that IS the benchmark must go. Distinct (doc, shingle)
    * pairs meet the benchmark set in one left equi join (zero-overlap
    * docs kept with n_hit = 0); the verdict cuts are integer
    * cross-multiplications (2*hits >= total → drop, 10*hits >= total
    * → flag), not float thresholds, so the oracle replays them
    * exactly.
    */
  def contaminationFraction(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame = {
    val tSh = train.select(col(idCol),
        explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
    val bSh = bench
      .select(explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
    tSh.join(bSh.withColumn("hit", lit(1L)), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_shingles"), 4).as("frac"),
        when(col("n_hit") * 2L >= col("n_shingles"), "drop")
          .when(col("n_hit") * 10L >= col("n_shingles"), "flag")
          .otherwise("keep").as("verdict"))
  }

  /** Benchmark decontamination: `train` minus contaminated docs
    * (left_anti on the contaminated id set). */
  def decontaminate(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame =
    train.join(contaminatedIds(train, bench, textCol, idCol, shingleK),
      Seq(idCol), "left_anti")

  /** [[contaminatedIds]] with a broadcast Bloom prefilter — the
    * 100 TB shape. The plain version shuffles the ENTIRE train
    * shingle stream into the equi join (∝ corpus tokens); here a
    * Bloom filter built over the benchmark's distinct shingles (the
    * small side, ~1e6-1e9 items → MBs) ships to every task inside a
    * literal, so the train scan drops non-matching shingles MAP-SIDE
    * and only the survivor sliver reaches the shuffle. Bloom filters
    * have no false negatives and the exact verify join removes the
    * false positives, so the output is bit-identical to
    * [[contaminatedIds]] — same oracle. Uses Catalyst's own
    * BloomFilterAggregate / BloomFilterMightContain (the runtime-
    * filter machinery, codegen-friendly), not a UDF.
    */
  def contaminatedIdsBloom(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.Shims
    import org.apache.spark.sql.types.BinaryType
    val bSh = bench
      .select(explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
      .persist() // read 3x below (count, filter build, verify join)
    // two-phase sizing (count, then build at max(n, 1024)): a filter
    // sized to a fixed 4M cap serialized a multi-MB Literal into
    // EVERY task's plan regardless of the real item count (~26k at
    // sf0.1 → ~24 KB when sized right) — plan (de)serialization, not
    // the probe, dominated the runtime. The extra pass only scans the
    // small bench side.
    val n = bSh.count()
    if (n == 0L)
      return train.select(col(idCol)).where(lit(false))
    val bf = bSh.agg(
      Shims.column(new BloomFilterAggregate(
        Shims.expression(xxhash64(col("sh"))),
        math.max(n, 1024L)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bloom = Shims.column(new BloomFilterMightContain(
      Literal(bf, BinaryType),
      Shims.expression(xxhash64(col("sh")))))
    val tSh = train
      .select(col(idCol),
        explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .where(bloom) // map-side prefilter: only Bloom hits shuffle
    tSh.join(bSh, "sh").select(col(idCol)).distinct()
  }

  /** Word n-grams of a token array as strings (empty when the doc has
    * fewer than `n` tokens — guarded, since Spark's `sequence(1, m)`
    * DESCENDS for m < 1 instead of returning empty; null tokens
    * propagate null, matching the ShingleStringsExpr kernel's
    * null-intolerant contract so the kernel==spec equality holds on
    * nullable input). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .when(toks.isNotNull, array().cast("array<string>"))

  /** Corpus-wide top-k n-grams — the classic corpus-stats build
    * (vocab / phrase tables). Explode is map-only (native
    * shingle_strings kernel — the [[ngrams]] HOF is its executable
    * spec); the count is a hash aggregate with map-side partial
    * combine, so the shuffle carries one row per DISTINCT n-gram per
    * partition, never the token stream. Ties broken by the n-gram
    * string.
    */
  def ngramTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(TextExprs.shingle_strings(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram")).limit(k)

  /** Top-k PMI collocations over adjacent token bigrams — the phrase
    * extractor (Church & Hanks '90) a corpus-analysis pass runs to
    * find multiword units worth keeping intact:
    * pmi = log2( (n_ab/N_b) / ((n_a/N_t) * (n_b/N_t)) ), restricted
    * to bigrams with n_ab >= `minCount` (raw PMI is top-heavy on
    * hapax pairs). All-count math, so the oracle replays it exactly;
    * the 4-dp round absorbs log2's last-ulp engine differences.
    *
    * Shapes: unigram + bigram counts are map-side-combined hash aggs;
    * the filtered bigram table joins the vocab twice (both sides
    * vocab-bounded, AQE sizes them); the two totals are one-row
    * aggregates crossed in; TakeOrdered cuts to k.
    */
  def collocationsPmi(df: DataFrame, textCol: String,
      k: Int = 20, minCount: Int = 5): DataFrame = {
    val uni = df.select(explode(TextFuncs.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val nt = uni.agg(sum(col("n_tok")).as("n_t"))
    val bigAll = df
      .select(explode(TextExprs.shingle_strings(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
    val nb = bigAll.agg(sum(col("n_ab")).as("n_bt"))
    bigAll.where(col("n_ab") >= minCount)
      .withColumn("a", split(col("bigram"), " ").getItem(0))
      .withColumn("b", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("tok").as("a"), col("n_tok").as("n_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("n_tok").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(nb))
      .withColumn("pmi", round(log2(
        (col("n_ab").cast("double") / col("n_bt")) /
          ((col("n_a").cast("double") / col("n_t")) *
            (col("n_b").cast("double") / col("n_t")))), 4))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(k)
  }

  /** Per-document n-gram repetition profile (the Gopher-style
    * repetition filters: docs dominated by a few repeated n-grams are
    * boilerplate/spam). For each doc:
    *   - `n_grams`   total n-gram occurrences,
    *   - `top_frac`  fraction taken by the single most frequent n-gram,
    *   - `dup_frac`  fraction of occurrences beyond first-of-kind
    *                 (1 - distinct/total).
    * Two hash aggregates, both map-side combined; nothing is
    * quadratic in document length. Only counts matter here, so the
    * n-gram identity is its 64-bit shingle HASH — longs group and
    * shuffle far cheaper than the n-gram strings (the oracle groups
    * by the same polynomial hash, so both engines share even the
    * theoretical collisions).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
        explode(TextExprs.shingle_hashes(col(textCol), n)).as("ngram"))
      .groupBy(col(idCol), col("ngram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        max(col("c")).as("top_c"),
        count(lit(1)).as("distinct_c"))
      .select(col(idCol), col("n_grams"),
        round(col("top_c").cast("double") / col("n_grams"), 4).as("top_frac"),
        round(lit(1.0) - col("distinct_c").cast("double") / col("n_grams"), 4)
          .as("dup_frac"))

  /** Deterministic shard id in [0, numShards) from the doc id — the
    * final "write the corpus as N even training shards" step. Same
    * multiplicative hash family as [[hashMod100]] (engine-portable,
    * reproducible across runs — rand() or monotonically_increasing_id
    * would not be). Map-only; the subsequent
    * `write.partitionBy("shard")` gives one directory per shard with
    * no shuffle beyond the write's own file fan-out.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("shard",
      pmod(pmod(pmod(col(idCol), lit(1000003L)) * lit(2654435761L),
        lit(4294967296L)), lit(numShards.toLong)))
  }

  /** Cross-document duplicated-span coverage — the corpus statistic
    * behind exact-substring dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"): for each doc, the
    * fraction of its k-token shingle occurrences whose shingle also
    * appears in at least one OTHER document. Docs with high coverage
    * are near-copies of corpus content even when no single pair-dedup
    * fired.
    *
    * Distributed form of the suffix-array approach: the shingle-hash
    * stream (∝ corpus tokens) is aggregated by hash with
    * count(distinct doc) — map-side combined — and the >1-doc subset
    * joins back onto the stream. Both shuffles key on the uniform
    * 64-bit shingle hash: no skew, no doc×doc pairs at any point.
    */
  def dupSpanFrac(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int): DataFrame = {
    val sh = df.select(col(idCol),
      explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
    val rep = sh.groupBy(col("sh"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") > 1)
      .select(col("sh"), lit(1L).as("rep"))
    sh.join(rep, Seq("sh"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        coalesce(sum(col("rep")), lit(0L)).as("dup_spans"))
      .select(col(idCol), col("n_spans"), col("dup_spans"),
        round(col("dup_spans").cast("double") / col("n_spans"), 4)
          .as("dup_frac"))
  }

  /** Token-budget mixture sampling: per-group keep rate =
    * min(100, (100 * budget) div group_tokens) percent, applied with
    * the deterministic [[hashMod100]] filter — the "cap every source
    * at B tokens" knob of corpus mixing. Integer arithmetic end to
    * end so the rate (and therefore the exact kept set) is
    * reproducible in any engine. Group totals are one tiny aggregate
    * (|groups| rows) broadcast back onto the corpus: no corpus-sized
    * shuffle at any step.
    */
  def mixByTokenBudget(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val tk = df.select(col(groupCol), col(idCol),
      size(TextFuncs.tokens(col(textCol))).cast("long").as("n_tokens"))
    val rates = tk.groupBy(col(groupCol))
      .agg(sum(col("n_tokens")).as("group_tokens"))
      .withColumn("rate_pct",
        least(lit(100L), expr(s"(100 * ${budgetTokens}L) div group_tokens")))
    tk.join(broadcast(rates), Seq(groupCol))
      .where(hashMod100(col(idCol)) < col("rate_pct"))
  }

  /** Temperature-scaled mixture weights over sources — the
    * multilingual/multi-source sampling formula (mC4/XLM-R lineage):
    * w_i = p_i^α / Σ p_j^α with p_i the source's natural token
    * share. α=1 keeps natural proportions, α→0 approaches uniform;
    * α≈0.7 is the standard compromise that up-weights small sources
    * without flattening the head. Output per source: token count,
    * natural share, temperature share, and the resulting up/down-
    * weight factor — the table a mixture sampler consumes.
    *
    * Scale shape: one tokenize pass folds to |sources| rows map-side;
    * everything after (pow, normalize) is arithmetic on that tiny
    * frame via a broadcast one-row total.
    */
  def temperatureMixture(df: DataFrame, textCol: String, srcCol: String,
      alpha: Double = 0.7): DataFrame = {
    val tok = df.select(col(srcCol),
        size(TextFuncs.tokens(col(textCol))).cast("long").as("nt"))
      .groupBy(col(srcCol)).agg(sum(col("nt")).as("n_tokens"))
    val tot = tok.agg(
      sum(col("n_tokens")).cast("double").as("total"),
      sum(pow(col("n_tokens").cast("double"), alpha)).as("ptot"))
    tok.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_tokens"),
        round(col("n_tokens") / col("total"), 4).as("nat_share"),
        round(pow(col("n_tokens").cast("double"), alpha) / col("ptot"), 4)
          .as("temp_share"),
        round((pow(col("n_tokens").cast("double"), alpha) / col("ptot")) /
          (col("n_tokens") / col("total")), 4).as("upweight"))
      .orderBy(col(srcCol))
  }

  /** Per-document unigram-LM cross-entropy — the classic
    * "perplexity filter" of LLM data pipelines (CCNet/Gopher lineage)
    * with the corpus itself as the language model:
    *
    *   xent(doc) = avg over token instances of -ln(count(w) / N)
    *
    * Low xent = repetitive/common-word text, high xent = rare-token
    * soup; both tails get filtered in practice. Deterministic (count
    * ratios + ln, 4-dp round), so it oracles directly.
    *
    * Scale shape: ONE tokenize+explode pass feeds both the vocab
    * count (map-side-combined groupBy(term)) and the scoring join;
    * the per-doc aggregate is map-side partial too. The vocab join is
    * a shuffle on term — bounded by distinct tokens, and skew on
    * stop-words is exactly what AQE skew-join handles; docs with zero
    * tokens drop out (no explode rows), matching the SQL oracle.
    */
  def unigramCrossEntropy(df: DataFrame, textCol: String, idCol: String,
      roundTo: Int = 4): DataFrame = {
    val terms = df.select(col(idCol),
      explode(TextFuncs.tokens(col(textCol))).as("term"))
      // tokenize once: vocab + scoring reuse it. LAZY checkpoint —
      // materializes on the first action, so plan-only callers
      // (explain/dry-run) don't pay a full tokenize job
      .localCheckpoint(eager = false)
    val tc = terms.groupBy("term").agg(count(lit(1)).as("c"))
    val tot = tc.agg(sum(col("c")).cast("double").as("n"))
    terms.join(tc, "term")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("c").cast("double") / col("n"))), roundTo).as("xent"))
      .orderBy(col(idCol))
  }

  /** Per-document bigram-LM cross-entropy — the second-order
    * [[unigramCrossEntropy]]: xent2(doc) = avg over bigram instances
    * of -ln(c(w1 w2) / c(w1 ·)), with the corpus's own bigram table
    * as the model and the proper conditional denominator (c(w1 ·) =
    * total bigrams starting with w1, so p(·|w1) sums to 1). A doc of
    * common words in UNCOMMON order scores high here while the
    * unigram filter passes it — the word-salad detector.
    *
    * Same scale shape as the unigram form: one bigram explode feeds
    * the count table and the scoring join; the prefix table folds the
    * bigram table (|bigrams| rows, not corpus rows). Deterministic:
    * integer counts, one ln, 4-dp round.
    */
  def bigramCrossEntropy(df: DataFrame, textCol: String, idCol: String,
      roundTo: Int = 4): DataFrame = {
    // bigrams ride as PACKED LONGS (h1*P + h2; context = pk div P —
    // see TextKernels.bigramPairHashes), so the two corpus-sized
    // joins shuffle 8-byte keys, never "w1 w2" strings
    val bi = df.select(col(idCol),
      explode(graft.functions.TextExprs.bigram_pair_hashes(col(textCol)))
        .as("pk"))
      .localCheckpoint(eager = false) // one bigram pass, three readers
    val bc = bi.groupBy(col("pk")).agg(count(lit(1)).as("cb"))
    val w1 = expr(s"pk div ${graft.functions.TextFuncs.P}")
    val pc = bc
      .withColumn("w1", w1)
      .groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
    bi.join(bc, "pk")
      .withColumn("w1", w1)
      .join(pc, "w1")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("cb").cast("double") / col("cw"))), roundTo)
          .as("xent2"))
      .orderBy(col(idCol))
  }

  /** Contamination forensics: the actual shared spans (shingle
    * STRINGS) between a training corpus and a benchmark, ranked by
    * how many train docs carry them — the human-readable evidence
    * behind a [[contaminatedIds]] hit list ("which sentence leaked"),
    * and the input to an allowlist (idioms that merely look shared).
    *
    * DISTINCT (shingle, doc) on each side first, so the join is
    * bounded by distinct spans × containing docs, never occurrence
    * counts; strings shuffle only for the top-k report (the detection
    * path stays on hashes).
    */
  def contaminationSpans(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 5,
      k: Int = 20): DataFrame = {
    def spans(df: DataFrame) = df.select(col(idCol).as("_d"),
        explode(graft.functions.TextExprs
          .shingle_strings(col(textCol), shingleK)).as("shingle"))
      .distinct()
    spans(train).as("t")
      .join(spans(bench).select(col("shingle"), col("_d").as("_bd"))
        .as("b"), "shingle")
      .groupBy(col("shingle"))
      .agg(countDistinct(col("_d")).as("n_train_docs"),
        countDistinct(col("_bd")).as("n_bench_docs"))
      .orderBy(col("n_train_docs").desc, col("shingle"))
      .limit(k)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): over the doc's k-shingle hash sequence, every
    * sliding window of `window` hashes selects its minimum (rightmost
    * position on ties), and the distinct selected (hash, pos) pairs
    * are the doc's fingerprints. Guarantees every shared run of
    * window+k-1 tokens yields at least one shared fingerprint, at
    * ~2/(window+1) the density of the full shingle stream — the
    * positional, guarantee-carrying alternative to minhash sketches.
    *
    * Selection is ONE window pass: min over the ROWS frame of
    * struct(h, -pos) — struct ordering gives (min hash, max pos)
    * directly, no self-join. Docs with fewer than `window` shingles
    * emit no fingerprints (no full window exists). Scale shape: the
    * shuffle is the doc-keyed posexplode stream (same as any shingle
    * op); the window sort is per-doc local.
    *
    * Returns (idCol, fp, fp_pos) distinct fingerprint rows.
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, window: Int = 4): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    val frame = byDoc.orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        window - 1)
    df.select(col(idCol),
        posexplode(graft.functions.TextExprs
          .shingle_hashes(col(textCol), shingleK)))
      .withColumnRenamed("col", "h")
      .withColumn("m", count(lit(1)).over(byDoc))
      .withColumn("sel", min(struct(col("h"), (-col("pos")).as("np")))
        .over(frame))
      .where(col("pos") <= col("m") - window)
      .select(col(idCol), col("sel.h").as("fp"),
        (-col("sel.np")).as("fp_pos"))
      .distinct()
  }

  /** Per-doc winnowing summary: shingle count, fingerprint count and
    * observed density vs the n-w+1 window starts (the paper's bound
    * is ~2/(w+1) of positions for random input).
    */
  def winnowSummary(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, window: Int = 4): DataFrame = {
    val fp = winnowFingerprints(df, textCol, idCol, shingleK, window)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_fp"))
    df.select(col(idCol),
        size(graft.functions.TextExprs.shingle_hashes(col(textCol),
          shingleK)).cast("long").as("n_grams"))
      .where(col("n_grams") >= window)
      .join(fp, Seq(idCol))
      .withColumn("density",
        round(col("n_fp").cast("double") /
          (col("n_grams") - window + 1), 4))
      .orderBy(col(idCol))
  }

  /** Zipf power-law fit per source: slope of ln(freq) on ln(rank)
    * over the top-`topN` tokens (rank by freq desc, term asc for a
    * deterministic rank<->freq pairing on ties). Natural text sits
    * near -1; a slope far from it flags template/boilerplate sources
    * (flat head) or ID-soup (no head at all) — a corpus-health
    * screen that needs no labels.
    *
    * Scale shape: tokenize+explode -> map-side-combined count per
    * (source, token) -> per-source top-N via row_number (bounded by
    * distinct tokens per source, NOT corpus rows) -> 5-number
    * regression aggregate. The only data-sized shuffle is the token
    * count; everything after is |sources| x topN rows.
    */
  def zipfSlope(df: DataFrame, textCol: String, srcCol: String,
      topN: Int = 500): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("c").desc, col("term"))
    df.select(col(srcCol), explode(TextFuncs.tokens(col(textCol))).as("term"))
      .groupBy(col(srcCol), col("term"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_terms"),
        round(regr_slope(log(col("c").cast("double")),
          log(col("rank").cast("double"))), 4).as("zipf_slope"))
      .orderBy(col(srcCol))
  }

  /** Top-k discriminative keywords per source: source-level TF-IDF
    * (occurrences of the term in the source x ln(n_sources /
    * n_sources_containing_it)). Terms shared by every source score 0
    * and drop out of the head; what survives is each source's
    * vocabulary fingerprint — the quick answer to "what IS this
    * source" before a token budget is allocated to it.
    *
    * Deterministic: integer tf/df, one ln at the end (4-dp round),
    * ties broken by term. Scale shape mirrors [[zipfSlope]]: one
    * (source, term) count shuffle, a |terms|-bounded df aggregate
    * joined back on term (AQE picks broadcast when vocab is small),
    * and a per-source top-k window over source-local rows.
    */
  def keywordsBySource(df: DataFrame, textCol: String, srcCol: String,
      k: Int = 5): DataFrame = {
    val tc = df.select(col(srcCol),
        explode(TextFuncs.tokens(col(textCol))).as("term"))
      .groupBy(col(srcCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfSrc = tc.groupBy(col("term"))
      .agg(count(lit(1)).as("df_src"))
    val nSrc = tc.agg(countDistinct(col(srcCol)).cast("double").as("n_src"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("score").desc, col("term"))
    tc.join(dfSrc, "term")
      .crossJoin(broadcast(nSrc))
      .withColumn("score",
        round(col("tf") * log(col("n_src") / col("df_src")), 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(srcCol), col("rk"), col("term"), col("tf"),
        col("df_src"), col("score"))
      .orderBy(col(srcCol), col("rk"))
  }
}
