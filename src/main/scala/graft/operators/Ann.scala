package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFunctions}

/** Approximate nearest neighbour — the batch/scale replacement for the
  * reference's HNSW graph (/root/reference/pkg/index/hnsw/hnsw.go).
  *
  * HNSW is a pointer-chasing, sequentially-built in-memory graph:
  * exactly what does NOT map to a 1000-executor cluster. The two
  * Spark-native strategies here keep the same contract (approximate
  * top-k, tunable recall/speed) while staying shuffle-bounded:
  *
  *  - LSH: deterministic random-hyperplane signatures; search touches
  *    only the query's bucket. Signature assign is map-only; at rest
  *    the corpus is written `partitionBy("bucket")` so a bucket probe
  *    is a partition-pruned scan, not a full read.
  *  - IVF: k-means coarse quantizer (Lloyd's over DataFrames, all
  *    reduces map-side-combined), then nprobe-nearest-cluster search.
  */
object Ann {

  // ---- LSH ---------------------------------------------------------------

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim j): integer arithmetic exact under IEEE double (< 2^53) so
    * any engine reproduces it bit-for-bit (Knuth multiplicative hash).
    */
  private def planeComponent(p: Column, j: Column): Column =
    ((p * 64 + j + 1) * 2654435761L % 4294967296L) / lit(4294967296.0) - 0.5

  /** Signature = `numPlanes`-bit integer, bit p set iff dot(v, plane_p) > 0.
    * Native codegen'd expression; the HOF form below is the executable
    * spec (equality-tested).
    */
  def lshSignature(vec: Column, numPlanes: Int = 8): Column =
    graft.functions.LshExpr.lsh_signature(vec, numPlanes)

  /** HOF composition of the same signature (mirrors the DuckDB oracle). */
  def lshSignatureHof(vec: Column, numPlanes: Int = 8): Column =
    aggregate(
      sequence(lit(0), lit(numPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val dot = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, j) => x.cast("double") * planeComponent(p, j)),
          lit(0.0), (a, x) => a + x)
        acc + when(dot > 0, pow(lit(2.0), p.cast("double")).cast("long")).otherwise(0L)
      })

  /** Bucketed ANN: exact metric, but only within the query's LSH
    * bucket(s). `probeHamming = 1` multi-probes every bucket within
    * hamming distance 1 of the query's signature (numPlanes + 1
    * buckets instead of 1) — recall jumps for one extra partition
    * probe per plane, still never a corpus scan.
    */
  def searchLsh(
      corpus: DataFrame, query: DataFrame, idCol: String, vecCol: String,
      metric: String, k: Int, numPlanes: Int = 8, roundTo: Int = 4,
      probeHamming: Int = 0): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshSignature(col(vecCol), numPlanes))
    val sig = lshSignature(col("qvec"), numPlanes)
    val probes: Column =
      if (probeHamming == 0) array(sig)
      else array(sig +: (0 until numPlanes).map(p =>
        sig.bitwiseXOR(lit(1L << p))): _*)
    val q = query
      .withColumn("qbucket", explode(probes))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    bucketed
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col(idCol), round(d, roundTo).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** OR-amplified multi-table LSH: `numTables` independent
    * `planesPerTable`-bit signatures; a corpus row is a candidate if
    * it shares ANY table's bucket with the query (the classic L-hash-
    * tables construction — match probability 1-(1-(1-θ/π)^b)^L, far
    * higher near-neighbor recall than one b*L-bit table at the same
    * total plane count). All L buckets come from ONE kernel signature
    * over b*L planes (table t = bits [t*b, (t+1)*b)), so the
    * signature cost doesn't grow with L.
    *
    * Shape: explode (table, bucket) on both sides, equi-join, dedupe
    * candidate ids, exact metric, TakeOrdered. This mirrors the
    * at-rest layout (L hash tables = L× bucket-partitioned copies, or
    * one copy partitionBy(tbl, bucket) with L× row duplication) where
    * a probe reads L partitions instead of scanning the corpus —
    * the storage-for-recall trade every multi-table LSH index makes.
    */
  /** (tbl, bucket) array for table t = bits [t*b, (t+1)*b) of a
    * combined b*L-plane signature; extracted with exact arithmetic
    * (sig < 2^52 keeps the fp floor-division exact, mirroring the
    * DuckDB oracle's floor(sig / 2^(t*b)) % 2^b). Shared by the
    * single-query and join forms so they can't diverge.
    */
  private def tableBuckets(
      sig: Column, planesPerTable: Int, numTables: Int): Column = {
    require(planesPerTable * numTables <= 52,
      "combined signature must stay fp-exact (planesPerTable * numTables <= 52)")
    val buckets = 1L << planesPerTable
    transform(sequence(lit(0), lit(numTables - 1)), t =>
      struct(t.as("tbl"),
        pmod(floor(sig / pow(lit(2.0), (t * planesPerTable).cast("double")))
          .cast("long"), lit(buckets)).as("bucket")))
  }

  def searchLshTables(
      corpus: DataFrame, query: DataFrame, idCol: String, vecCol: String,
      metric: String, k: Int, planesPerTable: Int = 4, numTables: Int = 4,
      roundTo: Int = 4): DataFrame = {
    def tb(sig: Column): Column = tableBuckets(sig, planesPerTable, numTables)
    val sigAll = lshSignature(col(vecCol), planesPerTable * numTables)
    val qsigAll = lshSignature(col("qvec"), planesPerTable * numTables)
    val bucketed = corpus
      .select(col(idCol), col(vecCol),
        explode(tb(sigAll)).as("tb"))
      .select(col(idCol), col(vecCol),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = query
      .select(col("qvec"), explode(tb(qsigAll)).as("tb"))
      .select(col("qvec"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    bucketed
      .join(broadcast(q), Seq("tbl", "bucket"))
      .dropDuplicates(idCol) // a pair can match in several tables
      .select(col(idCol), round(d, roundTo).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batch APPROXIMATE kNN join — the many-queries scale pattern.
    * Knn.knnJoin broadcasts the query set and scans q×|corpus| pairs;
    * here BOTH sides get multi-table LSH buckets and candidates come
    * from a (tbl, bucket) equi join, so the pair stream is only
    * bucket-collisions — neither side needs to fit in a broadcast and
    * corpus-vs-corpus joins (global near-dup, all-pairs ANN) stay
    * shuffle-bounded. Per-query top-k is the TopKPairs bounded-heap
    * aggregate (map-side partial, exchange carries <= q*k*partitions
    * rows). Output (qid, id, dist, rank) matches Knn.knnJoin.
    */
  def annJoinLsh(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      qidCol: String, qvecCol: String, metric: String, k: Int,
      planesPerTable: Int = 4, numTables: Int = 4,
      excludeSelf: Boolean = true, roundTo: Int = 4): DataFrame = {
    val total = planesPerTable * numTables
    val c = corpus
      .select(col(idCol), col(vecCol),
        explode(tableBuckets(lshSignature(col(vecCol), total),
          planesPerTable, numTables)).as("tb"))
      .select(col(idCol), col(vecCol),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = queries
      .select(col(qidCol), col(qvecCol),
        explode(tableBuckets(lshSignature(col(qvecCol), total),
          planesPerTable, numTables)).as("tb"))
      .select(col(qidCol), col(qvecCol),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col(qvecCol))
    c.join(q, Seq("tbl", "bucket"))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .select(col(qidCol), col(idCol), round(d, roundTo).as("dist"))
      // a pair matching in several tables must not occupy two heap
      // slots; the dedup shuffle is bounded by the candidate count
      .dropDuplicates(qidCol, idCol)
      .groupBy(col(qidCol))
      .agg(TopKAgg.topk_pairs(col("dist"), col(idCol), k).as("topk"))
      .select(col(qidCol), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col(qidCol), col("pair.id").as(idCol),
        col("pair.dist").as("dist"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col(qidCol), col("rank"))
  }

  // ---- IVF ---------------------------------------------------------------

  /** Lloyd's k-means over DataFrames. Deterministic: seeded from the
    * first k vectors in id order; each iteration is one broadcast
    * cross-join (assign) + one partial-aggregated shuffle (recenter).
    * Returns (cluster: int, centroid: array<double>).
    *
    * `trainSampleMod > 1` trains on the deterministic id-mod sample
    * (`id % trainSampleMod == 0`): centroids need ~100k vectors, so
    * iterating Lloyd's over a full 100 TB corpus is pure waste — train
    * on the sample, then tag/encode the FULL corpus (one map-side
    * pass). The id-mod sample (not `.sample()`) keeps the result
    * reproducible across runs for the driver's rows-only check.
    */
  /** Multi-k Lloyd's: train EVERY k in `ks` inside the same jobs —
    * per iteration ONE sample scan against a k-tagged centroid
    * broadcast (assignment groups by (k, id), recentering by (k,
    * cluster, pos)), instead of |ks| sequential training chains.
    * Numerically identical per k to [[kmeans]] at the same
    * iters/sample: same first-k-by-id seed rule, same (distance,
    * cluster) tie-break, same per-iteration 1e-6 centroid snap — a
    * model-selection sweep (cluster_elbow) trains its whole k grid
    * for the wall-clock of one chain. Returns (k, cluster, centroid).
    */
  def kmeansMulti(
      corpus: DataFrame, idCol: String, vecCol: String,
      ks: Seq[Int], iters: Int = 5, trainSampleMod: Long = 1): DataFrame = {
    require(ks.nonEmpty, "kmeansMulti needs at least one k")
    import corpus.sparkSession.implicits._
    val all = corpus.select(col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"))
    val vecs =
      if (trainSampleMod > 1) all.where(col("_id") % trainSampleMod === 0)
      else all
    val seedBase = vecs.orderBy(col("_id")).limit(ks.max)
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_id"))) - 1).as("cluster"),
        col("_v").as("centroid"))
    var cents = ks.toDF("k").crossJoin(seedBase)
      .where(col("cluster") < col("k"))
      .select(col("k"), col("cluster"), col("centroid"))
      .coalesce(1).localCheckpoint(eager = false)
    for (_ <- 0 until iters) {
      val assigned = vecs.crossJoin(broadcast(cents))
        .withColumn("_d", VectorFunctions.vec_l2(col("_v"), col("centroid")))
        .groupBy(col("k"), col("_id"))
        .agg(min_by(struct(col("cluster"), col("_v")),
          struct(col("_d"), col("cluster"))).as("_m"))
        .select(col("k"), col("_m.cluster").as("cluster"),
          col("_m._v").as("_v"))
      cents = assigned
        .select(col("k"), col("cluster"), posexplode(col("_v")))
        .groupBy(col("k"), col("cluster"), col("pos"))
        .agg(round(avg(col("col")), 6).as("m"))
        .groupBy(col("k"), col("cluster"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .coalesce(1).localCheckpoint(eager = false)
    }
    cents
  }

  def kmeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, trainSampleMod: Long = 1): DataFrame = {
    val all = corpus.select(col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"))
    val vecs =
      if (trainSampleMod > 1) all.where(col("_id") % trainSampleMod === 0)
      else all
    val seed = vecs.orderBy(col("_id")).limit(k)
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("_id"))) - 1)
          .as("cluster"),
        col("_v").as("centroid"))
    lloyd(vecs, seed, iters)
  }

  /** Lloyd's iterations from a given centroid seed (also the
    * compaction path: re-seed from a live index's current centroids).
    * Each iteration: map-side-combined assign + recenter; clusters
    * with no members drop out.
    *
    * Centroid means round to 6 dp each iteration: partition-order fp
    * drift in the mean (~1e-13) would otherwise accumulate across
    * iterations and make the result engine-specific; snapped to the
    * 1e-6 grid, any engine computing the same algorithm lands on
    * bit-identical centroids, which is what lets the driver oracle
    * the ITERATIVE ann_ivf/ann_pq queries (unrolled CTE chain in
    * SparkEntry.kmeansCtes), not just their static-centroid variants.
    * Quantizing a coarse quantizer at 1e-6 costs nothing: centroids
    * are cluster means, not data.
    */
  private def lloyd(vecs: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var centroids = init
    for (_ <- 0 until iters) {
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .select(col("cluster"), posexplode(col("_v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("col")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
      // cut lineage per iteration; the frame is k rows, so collapse to
      // ONE partition first — a 32-partition checkpoint of 8 rows costs
      // 32 scheduled tasks per iteration for nothing
      centroids = centroids.coalesce(1).localCheckpoint(eager = false)
    }
    centroids
  }

  /** Argmin-centroid assignment via broadcast cross-join + `min_by`
    * aggregation. The aggregate gets map-side partial aggregation, so
    * the exchange carries n rows — NOT the n×k candidate rows a
    * row_number() window would shuffle (the round-1 scale-killer).
    * Ties break like the old window did: (distance, cluster) ascending.
    *
    * Boundary contract: rows whose vector is null (or whose distance
    * evaluates to null, e.g. a malformed/mismatched-length vector with
    * null elements) are EXCLUDED from the output — `min_by` skips
    * null ordering keys, so such rows vanish from kmeans/tagCorpus
    * rather than surfacing. Callers feeding untrusted data should
    * filter/assert non-null fixed-length vectors first (the parquet
    * test tables guarantee this by schema).
    */
  private def assign(vecs: DataFrame, centroids: DataFrame,
      metaCols: Seq[String] = Nil): DataFrame = {
    val payload = struct(
      (col("cluster") +: col("_v") +: metaCols.map(col)): _*)
    vecs.crossJoin(broadcast(centroids))
      .withColumn("_d", VectorFunctions.vec_l2(col("_v"), col("centroid")))
      .groupBy(col("_id"))
      .agg(min_by(payload, struct(col("_d"), col("cluster"))).as("_m"))
      .select(
        (col("_id") +: col("_m.cluster").as("cluster") +:
          col("_m._v").as("_v") +:
          metaCols.map(c => col(s"_m.$c").as(c))): _*)
  }

  /** IVF index: corpus rows tagged with their cluster id. At scale,
    * write this `partitionBy("cluster")` (parquet) so search scans
    * only nprobe partitions.
    */
  def buildIvf(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, trainSampleMod: Long = 1): (DataFrame, DataFrame) = {
    val centroids = kmeans(corpus, idCol, vecCol, k, iters, trainSampleMod)
    (tagCorpus(corpus, idCol, vecCol, centroids), centroids)
  }

  /** Tag every corpus row with its argmin-l2 centroid. With a FIXED
    * centroid set (no k-means) the whole IVF path is deterministic and
    * SQL-expressible — the oracle-checked `ann_ivf_static` query uses
    * the first k corpus vectors as centroids.
    *
    * `metaCols` names extra corpus columns (labels, timestamps,
    * tenant ids …) to carry through onto the tagged rows, so an
    * at-rest index can serve FILTERED ANN — predicate applied inside
    * the probed clusters — without a join back to the base table.
    * They ride the min_by payload struct: no extra shuffle.
    *
    * Null contract (surfaced from the private assignment kernel):
    * rows with a null vector — or one whose distance evaluates null,
    * e.g. malformed length with null elements — are silently DROPPED
    * from the tagged index, not errored. Filter/assert non-null
    * fixed-length vectors first when the corpus is untrusted.
    */
  def tagCorpus(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, metaCols: Seq[String] = Nil): DataFrame = {
    val vecs = corpus.select(
      (col(idCol).as("_id") +:
        transform(col(vecCol), _.cast("double")).as("_v") +:
        metaCols.map(col)): _*)
    assign(vecs, centroids, metaCols)
      .select(
        (col("_id").as(idCol) +: col("_v").as(vecCol) +:
          col("cluster") +: metaCols.map(col)): _*)
  }

  /** Incremental maintenance: new vectors join an existing IVF index
    * by centroid assignment only (no retrain) — the insert path of a
    * live index (reference storage.go Insert + hnsw.go Add).
    */
  def appendToIvf(
      tagged: DataFrame, centroids: DataFrame,
      newRows: DataFrame, idCol: String, vecCol: String): DataFrame =
    tagged.unionByName(tagCorpus(newRows, idCol, vecCol, centroids))

  /** Delete ids from a live IVF index: a left-anti join against the
    * doomed-id set (reference storage.go Delete; HNSW instead has to
    * unlink graph nodes). No rebuild, no retag — remaining rows keep
    * their cluster, so an at-rest partitionBy("cluster") layout stays
    * valid and only rewritten partitions change.
    */
  def deleteFromIvf(
      tagged: DataFrame, idCol: String, doomed: DataFrame): DataFrame =
    tagged.join(doomed.select(col(idCol)), Seq(idCol), "left_anti")

  /** Per-cluster occupancy: (cluster, n, share). k rows — the input
    * to the retag-when-skewed decision and to at-rest partition-size
    * monitoring (one map-side-combined count per cluster).
    */
  def ivfStats(tagged: DataFrame): DataFrame = {
    val counts = tagged.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_t"))
    counts.crossJoin(broadcast(total))
      .select(col("cluster"), col("n"),
        round(col("n").cast("double") / col("_t"), 4).as("share"))
  }

  /** Compact / re-balance a live IVF index after churn: when the
    * occupancy is skewed (max cluster share > `maxShare` — inserts
    * and deletes concentrate in hot regions over time), re-run
    * Lloyd's on the CURRENT members seeded from the CURRENT centroids
    * and retag; otherwise return the index unchanged. The skew probe
    * reads k stat rows on the driver — bounded by design.
    *
    * Clusters that lost all members drop out of the recentering
    * (k may shrink); nprobe search semantics are unaffected. At rest,
    * follow with a partitionBy("cluster") rewrite of the changed
    * partitions.
    */
  def compactIvf(
      tagged: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      maxShare: Double = 0.5, iters: Int = 2): (DataFrame, DataFrame) = {
    val statRow = ivfStats(tagged).agg(max(col("share"))).head()
    // empty index -> max(share) is null -> nothing to rebalance
    val worst = if (statRow.isNullAt(0)) 0.0 else statRow.getDouble(0)
    if (worst <= maxShare) (tagged, centroids)
    else {
      val vecs = tagged.select(col(idCol).as("_id"),
        transform(col(vecCol), _.cast("double")).as("_v"))
      val newCents = lloyd(vecs, centroids, iters)
      (tagCorpus(tagged.drop("cluster"), idCol, vecCol, newCents), newCents)
    }
  }

  /** Persist an IVF index: corpus partitionBy(cluster) — the at-rest
    * layout where a probe is a partition-pruned scan of nprobe
    * directories, not a corpus read — plus the k-row centroid table.
    */
  def writeIndex(tagged: DataFrame, centroids: DataFrame, path: String): Unit = {
    tagged.write.mode("overwrite").partitionBy("cluster").parquet(s"$path/ivf")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted IVF index: (tagged, centroids). */
  def loadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/ivf"), spark.read.parquet(s"$path/centroids"))

  /** The query's `nprobe` l2-nearest clusters (1-row query in `qvec`).
    * Shared by IVF and IVF-PQ probing.
    */
  def nearestClusters(
      centroids: DataFrame, query: DataFrame, nprobe: Int): DataFrame =
    query.crossJoin(broadcast(centroids))
      .select(col("cluster"),
        VectorFunctions.vec_l2(
          transform(col("qvec"), _.cast("double")), col("centroid")).as("_d"))
      .orderBy(col("_d"), col("cluster")).limit(nprobe)
      .select(col("cluster"))

  /** Search an IVF index: probe the `nprobe` nearest clusters only. */
  def searchIvf(
      tagged: DataFrame, centroids: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, metric: String, k: Int,
      nprobe: Int = 2, roundTo: Int = 4): DataFrame = {
    val qc = nearestClusters(centroids, query, nprobe)
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    tagged
      .join(broadcast(qc), Seq("cluster")) // partition-prunes when bucketed at rest
      .crossJoin(broadcast(query))
      .select(col(idCol), round(d, roundTo).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batch form of [[searchIvf]]: many queries at once, each routed
    * to ITS `nprobe` nearest clusters and ranked independently —
    * `queries` is a (qid, qvec) frame. One broadcast of the routed
    * (qid, qvec, cluster) table replaces per-query driver loops, so a
    * micro-batch of streamed queries costs ONE partition-pruned scan
    * of the probed clusters' union, not |batch| jobs. Per-query
    * results are identical to [[searchIvf]] (same routing ties, same
    * rounded-distance + id ranking).
    */
  def searchIvfBatch(
      tagged: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, metric: String, k: Int,
      nprobe: Int = 2, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val routed = queries.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qvec"), col("cluster"),
        VectorFunctions.vec_l2(
          transform(col("qvec"), _.cast("double")), col("centroid")).as("_d"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("_d"), col("cluster"))))
      .where(col("_rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("cluster"))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    tagged
      .join(broadcast(routed), Seq("cluster")) // partition-prunes at rest
      .select(col("qid"), col(idCol), round(d, roundTo).as("dist"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col(idCol))))
      .where(col("_rn") <= k)
      .select(col("qid"), col(idCol), col("dist"))
  }

  /** Recall@k self-report for the LSH index: for each query vector,
    * how many of the exact top-k survive in the LSH-bucketed top-k
    * (`n_hit` of `k`). This is the index-quality audit every ANN
    * deployment runs after (re)build — recall is measured on a SAMPLE
    * of queries, so the exact side's query×corpus scoring is bounded
    * by the sample size, not the corpus; candidates on the LSH side
    * stay bucket-bounded as in [[searchLsh]]. Both rankings round to
    * 4 dp and tie-break by id, making the report deterministic and
    * engine-portable.
    */
  def lshRecallReport(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      metric: String, k: Int, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    val byQuery = Window.partitionBy(col("qid"))
      .orderBy(col("dist"), col(idCol))
    val exact = corpus.join(broadcast(q), lit(true))
      .select(col("qid"), col(idCol), round(d, 4).as("dist"))
      .withColumn("rn", row_number().over(byQuery))
      .where(col("rn") <= k)
      .select(col("qid"), col(idCol))
    val bucketed = corpus.withColumn("bucket", lshSignature(col(vecCol), numPlanes))
    val qb = q.withColumn("qbucket", lshSignature(col("qvec"), numPlanes))
    val approx = bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .select(col("qid"), col(idCol), round(d, 4).as("dist"))
      .withColumn("rn", row_number().over(byQuery))
      .where(col("rn") <= k)
      .select(col("qid"), col(idCol), lit(1L).as("hit"))
    exact.join(approx, Seq("qid", idCol), "left_outer")
      .groupBy(col("qid"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .orderBy(col("qid"))
  }

  /** Ranking-quality audit for the LSH index: binary-relevance
    * nDCG@k of the bucketed ranking vs the exact top-k (rel = 1 iff
    * the doc is in the exact top-k; DCG sums 1/log2(pos+1) at each
    * surviving doc's APPROX position; IDCG is the all-relevant
    * prefix). Recall counts the survivors — nDCG also asks how HIGH
    * they rank, which is what a retrieval eval set actually consumes.
    * Same shapes and bounds as [[lshRecallReport]]: exact side
    * bounded by the query sample, approx side bucket-bounded.
    */
  def lshNdcgReport(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      metric: String, k: Int, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    val byQuery = Window.partitionBy(col("qid"))
      .orderBy(col("dist"), col(idCol))
    val exact = corpus.join(broadcast(q), lit(true))
      .select(col("qid"), col(idCol), round(d, 4).as("dist"))
      .withColumn("rn", row_number().over(byQuery))
      .where(col("rn") <= k)
      .select(col("qid"), col(idCol))
    val bucketed = corpus.withColumn("bucket", lshSignature(col(vecCol), numPlanes))
    val qb = q.withColumn("qbucket", lshSignature(col("qvec"), numPlanes))
    val approx = bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .select(col("qid"), col(idCol), round(d, 4).as("dist"))
      .withColumn("rn", row_number().over(byQuery))
      .where(col("rn") <= k)
      .select(col("qid"), col(idCol), col("rn"))
    // both engines build IDCG from the same ascending fold, so the
    // quotient's operands are op-for-op identical
    val idcg = expr(
      s"aggregate(sequence(1, $k), 0D, (a, i) -> a + 1.0 / log2(i + 1))")
    exact.join(approx, Seq("qid", idCol), "left_outer")
      .groupBy(col("qid"))
      .agg(round(
        coalesce(sum(lit(1.0) / log2(col("rn") + 1)), lit(0.0)) / idcg,
        4).as("ndcg"))
      .orderBy(col("qid"))
  }
}
