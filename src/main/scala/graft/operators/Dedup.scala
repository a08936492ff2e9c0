package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SetExprs, TextExprs, TextFuncs, VectorFunctions}

/** Corpus deduplication for LLM training-data pipelines. Five
  * strategies, cheapest-first; all shuffle-bounded (candidate
  * generation is always blocked/bucketed — never a blind n² join).
  */
object Dedup {

  /** Exact dedup groups keyed by md5 of a column. Map-side-combining
    * hash aggregate; at 100 TB this is the one unavoidable shuffle
    * (by 128-bit digest, uniformly distributed).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("h"), col(idCol))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** MinHash+LSH candidate pairs.
    *
    * doc -> word k-shingles -> polynomial base hash per shingle ->
    * `numSeeds` seeded min-hashes -> bands of `rowsPerBand` ->
    * self-join on (band index, band signature). Shuffle is bounded by
    * band-bucket size; pairs never materialize outside a bucket.
    */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numSeeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    // native kernel (TextExprs) — formula-identical to the TextFuncs
    // HOF composition, one tight-loop call per row
    // localCheckpoint materializes the signatures ONCE: a self-join
    // re-executes each side's plan, so without it every doc is
    // shingled + minhashed twice (the dominant cost). n rows × 8
    // longs is small relative to the corpus; at rest you'd write the
    // signature table to parquet instead — [[incrementalMinhashPairs]]
    // is exactly that at-rest form.
    bandedPairs(
      minhashSigs(df, textCol, idCol, shingleK, numSeeds)
        .localCheckpoint(eager = true),
      numSeeds, rowsPerBand)
  }

  /** Near-dup provenance matrix: the minhash candidate pairs
    * cross-tabbed by canonicalized (source_a, source_b) — tells you
    * WHERE duplication comes from (mirrors inside one crawl vs
    * cross-source syndication), which decides the remediation
    * (drop a source vs keep-one across sources). Pair generation is
    * the band-bucketed [[minhashPairs]]; the doc->source lookup joins
    * the pair table against the two-column corpus projection
    * (AQE-sized — the pair side is usually the broadcast side), and
    * least/greatest canonicalize the unordered source pair.
    */
  def dupSourceMatrix(df: DataFrame, textCol: String, idCol: String,
      srcCol: String): DataFrame = {
    val pairs = minhashPairs(df, textCol, idCol)
    val src = df.select(col(idCol), col(srcCol))
    pairs
      .join(src.withColumnRenamed(idCol, "doc_a")
        .withColumnRenamed(srcCol, "sa"), "doc_a")
      .join(src.withColumnRenamed(idCol, "doc_b")
        .withColumnRenamed(srcCol, "sb"), "doc_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Band + bucket-join step of [[minhashPairs]] over an existing
    * (doc, sig) table — split out so a parameter sweep (or an at-rest
    * signature store) bands the SAME signatures under several widths
    * instead of re-minhashing the corpus per configuration.
    */
  def bandedPairs(sigs: DataFrame, numSeeds: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numSeeds / rowsPerBand
    val bands = sigs.select(
      col("doc"),
      explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        struct(b.as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))))
        .as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** Signature table for [[minhashPairs]] as a standalone, persistable
    * artifact: (doc, sig). At rest this is the incremental-dedup
    * state — write it once, and each increment only minhashes ITS OWN
    * documents (map-only) instead of re-shingling the corpus.
    */
  def minhashSigs(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numSeeds: Int = 8): DataFrame =
    // the guard and the kernel share one tokenization (trim + split +
    // drop empties); the null filter is belt-and-braces so a null sig
    // can never reach concat_ws (which skips nulls -> bogus shared keys)
    df.where(size(TextFuncs.tokens(col(textCol))) >= shingleK)
      .select(
        col(idCol).as("doc"),
        TextExprs.minhash_sig(col(textCol), shingleK, numSeeds).as("sig"))
      .where(col("sig").isNotNull)

  /** Incremental near-dup maintenance: candidate pairs for a NEW batch
    * of documents against an existing signature store, without
    * re-pairing the whole corpus. The increment is shingled/minhashed
    * map-only; the band join is (new bands) x (all bands), so pair
    * generation costs |new| x bucket density — not |corpus|² and not
    * even |corpus| x bands, since the old store is read at rest, not
    * recomputed. Old-old pairs are NOT re-emitted (they were produced
    * by earlier runs); the pair stream is exactly the pairs touching
    * at least one new doc.
    *
    * Returns (allSigs, newPairs): persist `allSigs` as next
    * increment's store; `newPairs` has the minhashPairs schema.
    * Union-equivalence with a full recompute is spec-asserted.
    */
  def incrementalMinhashPairs(oldSigs: DataFrame, newDocs: DataFrame,
      textCol: String, idCol: String,
      shingleK: Int = 3, numSeeds: Int = 8, rowsPerBand: Int = 2)
      : (DataFrame, DataFrame) = {
    val numBands = numSeeds / rowsPerBand
    val newSigs = minhashSigs(newDocs, textCol, idCol, shingleK, numSeeds)
    // one materialization of store ∪ increment: the band self-join
    // below reads each side from the checkpoint instead of re-running
    // the store's lineage twice (a parquet-backed store would be
    // re-SCANNED twice, a derived one re-COMPUTED twice — both worse
    // than one n×(numSeeds+1)-long block)
    val all = oldSigs.select(col("doc"), col("sig"), lit(false).as("isNew"))
      .union(newSigs.select(col("doc"), col("sig"), lit(true).as("isNew")))
      .localCheckpoint(eager = true)
    def bandsOf(sigs: DataFrame): DataFrame = sigs.select(
      col("doc"), col("isNew"),
      explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        struct(b.as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))))
        .as("bk"))
      .select(col("doc"), col("isNew"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = bandsOf(all).as("a"); val b = bandsOf(all).as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc") &&
          (col("a.isNew") || col("b.isNew")))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    (all.select(col("doc"), col("sig")), pairs)
  }

  /** Per-document 32-bit SimHash values (near-identical docs collide
    * or differ in few bits; join on value or banded bytes downstream).
    */
  def simhashDocs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc"),
      TextExprs.simhash32(col(textCol)).as("simhash"))

  /** Exact n-gram (token-set) Jaccard over *blocked* candidate pairs:
    * only docs sharing `blockCol` and within `idWindow` of each other
    * are compared — the blocking key is what keeps this linear-ish.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String, blockCol: String,
      idWindow: Int, minJaccard: Double): DataFrame = {
    // banded range join: bucket ids by the window size and probe each
    // bucket + its predecessor, so the equi-join key is (block,
    // bucket) — well-distributed parallelism instead of one task per
    // block value, and candidate pairs stay O(window) per row
    // token sets as SORTED hashed-long arrays: the per-pair cost drops
    // from string-array hash probes to a codegen'd two-pointer merge
    val base = df.select(
      col(idCol).as("doc"), col(blockCol).as("blk"),
      SetExprs.token_hash_set(col(textCol)).as("ts"),
      (col(idCol) / idWindow).cast("long").as("bkt"))
    val a = base.as("a")
    val b = base
      .withColumn("probe", explode(array(col("bkt"), col("bkt") - 1)))
      .as("b")
    val inter = SetExprs.sorted_intersect_size(col("a.ts"), col("b.ts"))
    a.join(b,
        col("a.blk") === col("b.blk") &&
          col("a.bkt") === col("b.probe") &&
          col("a.doc") < col("b.doc") &&
          col("b.doc") - col("a.doc") <= idWindow)
      .select(
        col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        round(inter.cast("double") /
          (size(col("a.ts")) + size(col("b.ts")) - inter), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Dedup index-quality audit — the minhash analog of
    * [[graft.operators.Ann.lshRecallReport]]: PREDICTED pairs (the
    * minhash band buckets) scored against GROUND-TRUTH pairs (exact
    * shingle-set Jaccard >= 1/2 over the SAME shingle universe the
    * signatures hash). One row: (n_true, n_pred, n_hit, precision,
    * recall) — the number every dedup deployment needs before
    * trusting a band/seed configuration.
    *
    * Truth generation is complete by construction: J > 0 requires a
    * shared shingle, so candidates come from the shingle equi join
    * over the deduped (doc, shingle) stream; the 1/2 cut is evaluated
    * in INTEGER arithmetic (3*inter >= |A|+|B|, since J >= 1/2 iff
    * 3i >= |A|+|B|) so the threshold is bit-portable across engines.
    * Scale note: candidate fan-out per shingle is document frequency;
    * at 100 TB this audit runs on a sample or caps hot shingles — it
    * is an offline index-quality job, not a serving path.
    */
  def minhashRecallReport(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, truth: Option[DataFrame] = None): DataFrame =
    scorePairs(truth.getOrElse(jaccardTruthPairs(df, textCol, idCol, shingleK)),
      minhashPairs(df, textCol, idCol, shingleK))

  /** Band/seed parameter sweep — [[minhashRecallReport]] across
    * configurations against ONE shared ground truth (checkpointed, so
    * the exact-Jaccard join runs once): the precision/recall frontier
    * a curator reads before picking an LSH configuration. More bands
    * of fewer rows → higher recall, lower precision; fewer, wider
    * bands → the reverse.
    */
  def minhashRecallMatrix(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3,
      configs: Seq[(Int, Int)] = Seq((8, 1), (8, 2), (8, 4)),
      truthIn: Option[DataFrame] = None): DataFrame = {
    val truth = truthIn.getOrElse(
      jaccardTruthPairs(df, textCol, idCol, shingleK)
        .localCheckpoint(eager = true))
    // one signature pass shared by every config — the sweep re-BANDS,
    // it never re-minhashes (at 100 TB the sig table is the at-rest
    // artifact; re-deriving it per config would triple the scan)
    val numSeeds = configs.map(_._1).max
    val sigs = minhashSigs(df, textCol, idCol, shingleK, numSeeds)
      .localCheckpoint(eager = true)
    configs.map { case (seeds, rpb) =>
      scorePairs(truth, bandedPairs(sigs, seeds, rpb))
        .select(lit(s"seeds=$seeds,rows_per_band=$rpb").as("config"),
          col("n_true"), col("n_pred"), col("n_hit"),
          col("precision"), col("recall"))
    }.reduce(_ unionByName _).orderBy(col("config"))
  }

  /** [[minhashRecallReport]] for the winnow generator: winnow-pair
    * predictions scored against the same exact-Jaccard>=1/2 truth.
    * Winnowing's guarantee is per shared RUN (w+k-1 tokens), not per
    * Jaccard level, so this report is how the two generators compare
    * on equal footing — minhash tracks resemblance in probability,
    * winnowing tracks shared spans deterministically.
    */
  def winnowRecallReport(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, window: Int = 4, minShared: Int = 2,
      truth: Option[DataFrame] = None): DataFrame =
    scorePairs(truth.getOrElse(jaccardTruthPairs(df, textCol, idCol, shingleK)),
      winnowPairs(df, textCol, idCol, shingleK, window,
        minShared = minShared).select(col("doc_a"), col("doc_b")))

  /** [[minhashRecallMatrix]] for the winnow generator: the
    * min-shared-fingerprints threshold IS winnowing's precision
    * knob (window width trades density for guarantee length and is
    * usually fixed), so the sweep derives every config from ONE pair
    * table — winnowPairs at minShared=1 keeps the n_shared column,
    * and each row of the frontier is a threshold filter over it. One
    * fingerprint pass, one join, |configs| aggregates.
    */
  def winnowRecallMatrix(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, window: Int = 4,
      minSharedConfigs: Seq[Int] = Seq(1, 2, 3),
      truthIn: Option[DataFrame] = None): DataFrame = {
    val truth = truthIn.getOrElse(
      jaccardTruthPairs(df, textCol, idCol, shingleK)
        .localCheckpoint(eager = true))
    val pairs = winnowPairs(df, textCol, idCol, shingleK, window,
        minShared = 1)
      .localCheckpoint(eager = true)
    minSharedConfigs.map { s =>
      scorePairs(truth, pairs.where(col("n_shared") >= s)
          .select(col("doc_a"), col("doc_b")))
        .select(lit(s"window=$window,min_shared=$s").as("config"),
          col("n_true"), col("n_pred"), col("n_hit"),
          col("precision"), col("recall"))
    }.reduce(_ unionByName _).orderBy(col("config"))
  }

  /** Ground-truth near-dup pairs: exact shingle-set Jaccard >= 1/2
    * via the integer cut (see [[minhashRecallReport]]'s doc).
    * Public so a caller auditing SEVERAL generators against the same
    * corpus can compute the truth once (it is deterministic per
    * (corpus, shingleK)) and pass it to each report via their
    * `truth` parameter — the graphExactTop8 at-rest discipline:
    * ground truth is audit infrastructure, priced once per corpus,
    * while each audited generator still computes its own predictions.
    */
  def jaccardTruthPairs(df: DataFrame, textCol: String,
      idCol: String, shingleK: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("doc"),
        array_sort(array_distinct(
          TextExprs.shingle_hashes(col(textCol), shingleK))).as("ss"))
      .where(size(col("ss")) > 0)
      .localCheckpoint(eager = true) // read 3x: explode + both join sides
    val ex = sets.select(col("doc"), explode(col("ss")).as("sh"))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc").as("doc_a"), col("ss").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("ss").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        SetExprs.sorted_intersect_size(col("sa"), col("sb")).as("i"),
        (size(col("sa")) + size(col("sb"))).as("s"))
      .where(lit(3) * col("i") >= col("s"))
      .select(col("doc_a"), col("doc_b"))
  }

  /** [[winnowRecallReport]] generalized to ANY candidate generator:
    * scores a (doc_a, doc_b) pair frame against the same exact
    * Jaccard>=1/2 shingle truth the minhash/winnow audits use — the
    * plug-in point for new generators (CDC chunk digests, embedding
    * buckets) to join the measured quality framework. */
  def recallReport(df: DataFrame, textCol: String, idCol: String,
      pred: DataFrame, shingleK: Int = 3,
      truth: Option[DataFrame] = None): DataFrame =
    scorePairs(truth.getOrElse(jaccardTruthPairs(df, textCol, idCol, shingleK)),
      pred.select(col("doc_a"), col("doc_b")))

  private def scorePairs(truth: DataFrame, pred: DataFrame): DataFrame =
    truth.withColumn("t", lit(1L))
      .join(pred.withColumn("p", lit(1L)), Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        coalesce(sum(col("t")), lit(0L)).as("n_true"),
        coalesce(sum(col("p")), lit(0L)).as("n_pred"),
        coalesce(sum(col("t") * col("p")), lit(0L)).as("n_hit"))
      .select(col("n_true"), col("n_pred"), col("n_hit"),
        when(col("n_pred") > 0,
          round(col("n_hit").cast("double") / col("n_pred"), 4)).as("precision"),
        when(col("n_true") > 0,
          round(col("n_hit").cast("double") / col("n_true"), 4)).as("recall"))

  /** Connected components over the near-dup pair graph by iterative
    * min-label propagation: every node's label converges to the
    * smallest id reachable from it — the canonical cluster
    * representative for keep-one dedup (candidate pairs say "a ~ b";
    * transitive closure says which rows form ONE duplicate group).
    *
    * Each round is one join + one aggregate; the label sum strictly
    * decreases until fixpoint, so convergence is a single scalar
    * aggregate per round (summed as decimal(38,0) — a LONG sum of
    * n×max_id overflows at corpus scale), never a collect of the
    * labels. Rounds needed = graph diameter: near-dup graphs are
    * unions of quasi-cliques (bucket-mates all pair with each other),
    * so the diameter is small; for adversarially chained graphs use
    * O(log n)-round star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — this propagation form is
    * kept because it is also expressible as the oracle's recursive
    * CTE. localCheckpoint per round cuts the otherwise
    * exponentially-growing join lineage.
    *
    * Output: (nodeCol, rep) for every node, rep = min id of its
    * component (isolated nodes keep themselves).
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      nodeCol: String, aCol: String, bCol: String,
      maxRounds: Int = 30): DataFrame = {
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .union(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .distinct()
      .localCheckpoint(eager = false)
    // only nodes WITH edges can ever change label: propagate over the
    // edge subgraph (a small fraction of a 100 TB corpus — near-dup
    // members only) and union the untouched singletons back at the end
    val edgeNodes = edges.select(col("s").as("n")).distinct()
    var labels = edgeNodes.select(col("n"), col("n").as("lbl"))
      .localCheckpoint(eager = false)
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prev = lblSum(labels)
    var round = 0
    var done = false
    // round shape kept deliberately plain after measuring two
    // alternatives on the 5%-cut kNN dup subgraph at sf0.1 (the
    // highest-diameter caller): pointer jumping (path halving) LOST
    // (~2.9 s -> 3.8-5.0 s — the extra |nodes|-keyed self-join and
    // its materialization outweigh the round savings), and batching
    // two propagation steps per convergence sync was FLAT (~3.0 s) —
    // under AQE every exchange is already a stage-materialization
    // barrier, so per-round cost is exchange count, not driver
    // syncs, and both variants add exchanges per unit progress.
    while (!done && round < maxRounds) {
      val nbrMin = edges.join(labels, col("d") === col("n"))
        .groupBy(col("s")).agg(min(col("lbl")).as("nbl"))
      val next = labels.join(nbrMin, col("n") === col("s"), "left")
        .select(col("n"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(eager = false)
      val cur = lblSum(next)
      done = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      round += 1
    }
    // a silent cap would return labels that are NOT component minima
    // (keep-one dedup would keep several docs of one duplicate group
    // with no sign anything went wrong) — fail loudly instead
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "graph diameter exceeds the cap; raise maxRounds or use " +
        "O(log n) star contraction for chain-shaped graphs")
    val singletons = nodes.select(col(nodeCol).as("n"))
      .join(edgeNodes, Seq("n"), "left_anti")
      .select(col("n"), col("n").as("lbl"))
    labels.union(singletons)
      .select(col("n").as(nodeCol), col("lbl").as("rep"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", 2014) — the O(log n)-round form the
    * [[connectedComponents]] docstring defers to for adversarially
    * CHAIN-shaped graphs, where min-label propagation needs
    * diameter-many rounds (and trips its maxRounds guard).
    *
    * Each round is two groupBy-min passes over the CURRENT edge set
    * (which only shrinks toward one star edge per non-root node), so
    * a 100 TB near-dup graph costs O(log n) bounded shuffles instead
    * of O(diameter). large-star hangs every neighbor LARGER than u
    * off the minimum of u's closed neighborhood (keeps trees shallow
    * without ever pointing a smaller id at a larger one); small-star
    * then re-parents u and its not-larger neighbors to that minimum.
    * Convergence = the canonical edge set stops changing, checked by
    * count + an order-independent decimal checksum (never a collect).
    *
    * Output: (nodeCol, rep) for every node — identical fixpoint to
    * [[connectedComponents]] (rep = component minimum; isolated nodes
    * keep themselves), so either can serve the same recursive-CTE
    * oracle.
    */
  def connectedComponentsStar(nodes: DataFrame, pairs: DataFrame,
      nodeCol: String, aCol: String, bCol: String,
      maxRounds: Int = 25): DataFrame = {
    val sym0 = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
    var edges = sym0.localCheckpoint(eager = false)
    // order-independent fingerprint of the canonical (min, max) edge
    // set; xxhash64 decorrelates ids so a swap can't preserve the sum
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .distinct()
        .agg(count(lit(1)),
          sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")))
        .head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    var prev = sig(edges)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // large-star: per node u over the SYMMETRIZED neighborhood
      // (edges become directed child->parent after round 1),
      // m = min(neighborhood ∪ {u}); re-parent only neighbors v > u
      // onto m — every undirected edge is handled exactly once, from
      // its smaller endpoint's group
      val sym = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct()
      val mLarge = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(mLarge, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // small-star over edges oriented child=max, parent=min:
      // per child u, m = min(parents ∪ {u}); re-parent u and every
      // parent onto m
      val small0 = large
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
      val mSmall = small0.groupBy(col("u"))
        .agg(min(col("v")).as("m"))
      val small = small0.join(mSmall, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(eager = false)
      val cur = sig(small)
      done = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      edges = small
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxRounds " +
        "rounds — star contraction is O(log n), so this indicates a " +
        "bug or an astronomically large component, not a deep graph")
    // at fixpoint edges are stars (child -> component min); nodes that
    // appear only as a star CENTER or not at all label themselves
    val starLabels = edges.select(col("u").as("n"), col("v").as("lbl"))
    val selfLabels = nodes.select(col(nodeCol).as("n"))
      .join(starLabels.select(col("n")), Seq("n"), "left_anti")
      .select(col("n"), col("n").as("lbl"))
    starLabels.union(selfLabels)
      .select(col("n").as(nodeCol), col("lbl").as("rep"))
  }

  /** Top-k closest pairs by embedding cosine distance, EXACT all-pairs
    * form: O(n²) candidates — only for small corpora / recall
    * measurement. The shipped query path is [[lshClosestPairs]].
    */
  def closestEmbeddingPairs(
      df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.vec_cosine(col("va"), col("vb")), 4).as("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Smallest p in [1, 30] with 2^p * targetBucket >= n: the plane
    * count that keeps the EXPECTED bucket size at `targetBucket`.
    * Integer-exact on purpose (no floating log2, whose rounding at
    * exact powers of two could disagree with the DuckDB oracle's
    * equivalent `min p where 2**p * target >= n` computation).
    */
  def adaptivePlanes(n: Long, targetBucket: Int = 32): Int = {
    require(targetBucket > 0, "targetBucket must be positive")
    var p = 1
    while (p < 30 && (1L << p) * targetBucket < n) p += 1
    p
  }

  /** Top-k closest embedding pairs at scale: candidates are generated
    * by LSH bucketing (random-hyperplane signature — the same
    * deterministic planes as Ann.lshSignature), cosine is computed
    * only WITHIN a bucket, and the global top-k pair stream is a
    * `TakeOrderedAndProject` (per-partition heap, no corpus shuffle
    * beyond the bucket equi-join). Shuffle ∝ Σ bucket² not n².
    *
    * Two scale knobs (both output-invariant except numPlanes):
    *  - `numPlanes <= 0` (the default) DERIVES the plane count from
    *    the corpus via [[adaptivePlanes]] — one count() job at build —
    *    so the expected bucket size stays `targetBucket` as the corpus
    *    grows instead of pinning a quadratic constant (n²/2^planes
    *    with fixed planes is still quadratic). The plane count changes
    *    which pairs are candidates, so the DuckDB oracle computes the
    *    SAME integer formula from count(*).
    *  - `saltBuckets = s > 1` splits each bucket's pair grid over s²
    *    join cells ((id_a % s, id_b % s), each side replicated s ways)
    *    so one dense bucket becomes s² bounded tasks instead of a
    *    single straggler/OOM task. The candidate PAIR SET is identical
    *    for any s — each pair meets in exactly one cell — so results
    *    (and the oracle) don't change; spec-asserted.
    *
    * Near-identical embeddings land in the same bucket with
    * probability (1 - θ/π)^numPlanes ≈ 1 for θ→0, so near-dup recall
    * stays high while far pairs are never compared.
    */
  def lshClosestPairs(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 0, targetBucket: Int = 32,
      saltBuckets: Int = 1): DataFrame = {
    val planes =
      if (numPlanes > 0) numPlanes
      else adaptivePlanes(df.count(), targetBucket)
    val bucketed = df.select(
      col(idCol).as("_pid"), col(vecCol).as("_pv"),
      Ann.lshSignature(col(vecCol), planes).as("bucket"))
    val s = saltBuckets
    val (a, b) =
      if (s <= 1) (
        bucketed.select(
          col("bucket"), col("_pid").as("id_a"), col("_pv").as("va")),
        bucketed.select(
          col("bucket"), col("_pid").as("id_b"), col("_pv").as("vb")))
      else (
        // grid cell (ga, gb): the a-row owns ga = id_a % s and fans
        // out over all gb; the b-row owns gb and fans out over all ga.
        // Pair (x, y) meets at exactly (x%s, y%s).
        bucketed.select(
          col("bucket"), pmod(col("_pid"), lit(s.toLong)).as("ga"),
          explode(sequence(lit(0L), lit(s.toLong - 1))).as("gb"),
          col("_pid").as("id_a"), col("_pv").as("va")),
        bucketed.select(
          col("bucket"), explode(sequence(lit(0L), lit(s.toLong - 1))).as("ga"),
          pmod(col("_pid"), lit(s.toLong)).as("gb"),
          col("_pid").as("id_b"), col("_pv").as("vb")))
    val joinKeys = if (s <= 1) Seq("bucket") else Seq("bucket", "ga", "gb")
    a.join(b, joinKeys)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.vec_cosine(col("va"), col("vb")), 4).as("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Edit-distance verify pass over candidate pairs: joins the raw
    * text back onto (doc_a, doc_b) pairs and keeps pairs whose
    * Levenshtein distance is within `maxDist`. The expensive O(len²)
    * comparison runs ONLY on pairs a cheap generator (minhash bands,
    * simhash, LSH) already blocked — the standard two-phase
    * candidate/verify shape; never call this on a raw cross join.
    * Both join probes broadcast the (small) pair list against the
    * at-rest corpus, so the corpus is read once per side with no
    * shuffle of the text column.
    */
  def editVerify(df: DataFrame, pairs: DataFrame, textCol: String,
      idCol: String, maxDist: Int): DataFrame = {
    val txt = df.select(col(idCol).as("_eid"), col(textCol).as("_et"))
    // the pair list is bounded by the candidate generator's contract —
    // broadcast it (and the pair-sized first join result) so the
    // corpus text column streams map-side through both probes instead
    // of sort-merge-shuffling twice
    val withA = broadcast(pairs)
      .join(txt, col("doc_a") === col("_eid"))
      .withColumnRenamed("_et", "_ta").drop("_eid")
    broadcast(withA)
      .join(txt, col("doc_b") === col("_eid"))
      // threshold form: banded O(len·maxDist) DP with early exit
      // (returns -1 past the band) instead of the full O(len²) matrix
      // — the verify pass only ever needs distances <= maxDist
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("_ta"), col("_et"), maxDist).as("edit_dist"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  /** Near-dup candidate pairs from winnowing fingerprints — the
    * guarantee-carrying alternative to [[minhashPairs]]: any shared
    * token run of window+k-1 tokens is certain to share a
    * fingerprint (minhash only shares in probability), at ~2/(w+1)
    * of the shingle stream's volume. Pair generation is an equi join
    * on the fingerprint hash with a document-frequency cap first:
    * fingerprints in more than `maxDf` docs are boilerplate and
    * dropped, bounding fan-out per hash at maxDf² instead of df² —
    * the same DISTINCT-then-cap shape as Corpus.sourceOverlap.
    */
  def winnowPairs(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, window: Int = 4, maxDf: Int = 50,
      minShared: Int = 2): DataFrame = {
    val fp = Corpus.winnowFingerprints(df, textCol, idCol,
        shingleK, window)
      .select(col(idCol).as("doc"), col("fp")).distinct()
      .localCheckpoint(eager = true) // reused on both join sides
    val keep = fp.groupBy(col("fp")).agg(count(lit(1)).as("df_docs"))
      .where(col("df_docs") <= maxDf)
    val pruned = fp.join(keep.select("fp"), "fp")
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Normalization-aware dedup report: per source, how many distinct
    * documents survive under raw equality vs under the canonical form
    * (NFC + lowercase + whitespace collapse — TextKernels
    * .normalizeText). `n_raw - n_norm` is exactly the duplicate mass
    * that raw exact-dedup MISSES because it treats case/whitespace
    * variants as distinct — the number that decides whether the
    * canonicalize pass is worth a second md5 at corpus scale.
    *
    * Scale shape: one map pass computes both digests, one groupBy
    * (source) with approx-free exact distincts via two
    * count(DISTINCT) — Spark expands to a single aggregate with
    * two grouping-expression paths, still map-side partial.
    */
  def normalizedDedupReport(df: DataFrame, textCol: String,
      srcCol: String): DataFrame =
    df.select(col(srcCol),
        md5(col(textCol)).as("h_raw"),
        md5(TextExprs.normalize_text(col(textCol))).as("h_norm"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h_raw")).as("n_raw"),
        countDistinct(col("h_norm")).as("n_norm"))
      .withColumn("n_collapsed", col("n_raw") - col("n_norm"))
      .orderBy(col(srcCol))

  /** Asymmetric containment over minhash candidate pairs:
    * C = |A ∩ B| / min(|A|, |B|) on token-hash SETS — catches a small
    * document embedded inside a big one, which resemblance (Jaccard)
    * structurally misses: a 100-token doc fully contained in a
    * 10k-token doc has J ≈ 0.01 but C = 1.0. The candidate generator
    * is the same band-bucketed [[minhashPairs]] (shingle minhash is a
    * resemblance sketch, so recall for extreme containment needs the
    * band config widened — this is the verify pass, not the sketch).
    *
    * Output: (doc_a, doc_b, jaccard, containment) for candidates with
    * C >= minContainment; the interesting rows are high-C/low-J.
    * Scale: token sets travel as sorted long arrays; the per-pair
    * kernel is the codegen'd two-pointer merge. Only the BARE
    * (doc_a, doc_b) pair list is ever broadcast (once, into the
    * doc_a set lookup); the second lookup is a plain shuffle join —
    * after the first join each pair carries doc_a's full token-set
    * array, and force-broadcasting THAT would put pairs × set-size
    * bytes on the driver, bypassing AQE's sizing at corpus scale.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
      minContainment: Double = 0.5): DataFrame = {
    val sets = df.select(col(idCol).as("_cid"),
      SetExprs.token_hash_set(col(textCol)).as("_cs"))
    val withA = sets
      .join(broadcast(minhashPairs(df, textCol, idCol)),
        col("_cid") === col("doc_a"))
      .withColumnRenamed("_cs", "_sa").drop("_cid")
    withA
      .join(sets, col("doc_b") === col("_cid"))
      .withColumnRenamed("_cs", "_sb")
      .withColumn("_i",
        SetExprs.sorted_intersect_size(col("_sa"), col("_sb"))
          .cast("double"))
      .select(col("doc_a"), col("doc_b"),
        round(col("_i") /
          (size(col("_sa")) + size(col("_sb")) - col("_i")), 4)
          .as("jaccard"),
        round(col("_i") / least(size(col("_sa")), size(col("_sb"))), 4)
          .as("containment"))
      .where(col("containment") >= minContainment)
  }
}
