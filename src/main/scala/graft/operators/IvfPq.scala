package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed production vector index (Jégou et al. 2011,
  * the FAISS `IVFx,PQy` family; the HNSW-replacement pairing of the
  * reference's index surface at batch scale). A coarse k-means
  * quantizer routes a query to `nprobe` clusters, and within those
  * clusters the search scans only 8-byte PQ codes with ADC scoring —
  * so a query touches nprobe/k of the corpus AND reads 32x fewer
  * bytes per touched row. At rest the codes are partitioned by
  * cluster: probing = partition-pruned scan of nprobe directories.
  *
  * This variant PQ-encodes the raw vectors (IVF-Flat-PQ). Classic
  * IVF-PQ encodes residuals (x - centroid) for tighter quantization;
  * that swaps one `transform` into the encode input and a query-side
  * per-cluster ADC table. Both forms are DuckDB-oracled end to end —
  * static centroids (`ann_ivfpq_static`) and TRAINED, raw
  * (`ann_ivfpq`) and residual (`ann_ivfpq_residual`), via the
  * 1e-6-snapped unrolled k-means chains.
  */
object IvfPq {

  /** codes: (idCol, cluster, codes array<int>). */
  case class Index(centroids: DataFrame, model: Pq.Model, codes: DataFrame)

  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, kClusters: Int = 16, ivfIters: Int = 3,
      m: Int = 8, kCodes: Int = 16, pqIters: Int = 2,
      trainSampleMod: Long = 1): Index = {
    val (tagged, centroids) = Ann.buildIvf(
      corpus, idCol, vecCol, kClusters, ivfIters, trainSampleMod)
    val model = Pq.train(corpus, idCol, vecCol, dim, m, kCodes, pqIters,
      trainSampleMod)
    Index(centroids, model,
      Pq.encode(model, corpus, idCol, vecCol)
        .join(tagged.select(col(idCol), col("cluster")), Seq(idCol)))
  }

  /** Deterministic variant for oracles/tests: centroids = first
    * kClusters vectors, codebooks = subvectors of the first kCodes.
    */
  def staticIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, kClusters: Int = 8, m: Int = 8, kCodes: Int = 16): Index = {
    val cents = corpus.where(col(idCol) < kClusters)
      .select(col(idCol).cast("int").as("cluster"),
        transform(col(vecCol), _.cast("double")).as("centroid"))
    val tagged = Ann.tagCorpus(corpus, idCol, vecCol, cents)
    val model = Pq.staticCodebooks(corpus, idCol, vecCol, dim, m, kCodes)
    Index(cents, model,
      Pq.encode(model, corpus, idCol, vecCol)
        .join(tagged.select(col(idCol), col("cluster")), Seq(idCol)))
  }

  /** Probe nprobe clusters, ADC-score only their codes. Fully lazy
    * (query stays a broadcast one-row frame with `qvec`).
    */
  def search(index: Index, query: DataFrame, idCol: String,
      topK: Int, nprobe: Int = 2): DataFrame = {
    val qc = Ann.nearestClusters(index.centroids, query, nprobe)
    val cand = index.codes
      .join(broadcast(qc), Seq("cluster")) // partition-prunes at rest
      .select(col(idCol), col("codes"))
    Pq.searchAdcJoin(index.model, cand, query, idCol, topK)
  }

  /** Classic residual IVF-PQ (Jégou et al. §IV): PQ encodes
    * x - centroid(x) instead of x, so all codebook mass models the
    * WITHIN-cluster geometry — tighter quantization, higher recall at
    * identical code size. The coarse routing/storage layout is
    * unchanged; only the encode input and the query side differ (each
    * probed cluster scores against its own residual query q - c).
    */
  def buildResidual(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, kClusters: Int = 16, ivfIters: Int = 3,
      m: Int = 8, kCodes: Int = 16, pqIters: Int = 2,
      trainSampleMod: Long = 1): Index = {
    val (tagged, centroids) = Ann.buildIvf(
      corpus, idCol, vecCol, kClusters, ivfIters, trainSampleMod)
    val resid = tagged.join(broadcast(centroids), Seq("cluster"))
      .select(col(idCol), col("cluster"),
        zip_with(col(vecCol), col("centroid"),
          (x, c) => x.cast("double") - c).as("_r"))
      .localCheckpoint(true) // encode + train both consume it
    val sample =
      if (trainSampleMod > 1) resid.where(col(idCol) % trainSampleMod === 0)
      else resid
    val model = Pq.train(sample, idCol, "_r", dim, m, kCodes, pqIters)
    Index(centroids, model,
      Pq.encode(model, resid, idCol, "_r")
        .join(resid.select(col(idCol), col("cluster")), Seq(idCol)))
  }

  /** Search a residual index: every probed cluster gets its own
    * residual query (q - centroid), and ADC scores each candidate's
    * codes against its cluster's residual. Same join shape as the
    * raw-vector path — one extra tiny (nprobe-row) broadcast.
    */
  def searchResidual(index: Index, query: DataFrame, idCol: String,
      topK: Int, nprobe: Int = 2, roundTo: Int = 4): DataFrame = {
    val m = index.model
    val qc = Ann.nearestClusters(index.centroids, query, nprobe)
    val qres = qc.join(broadcast(index.centroids), Seq("cluster"))
      .crossJoin(broadcast(query))
      .select(col("cluster"),
        zip_with(col("qvec"), col("centroid"),
          (x, c) => x.cast("double") - c).as("qres"))
    val exploded = index.codes
      .join(broadcast(qres), Seq("cluster")) // partition-prunes at rest
      .select(col(idCol), col("qres"),
        posexplode(col("codes")).as(Seq("grp", "code")))
    val qsub = slice(col("qres"), col("grp") * m.subDim + 1, lit(m.subDim))
    val pd = aggregate(
      zip_with(qsub, col("centroid"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    exploded
      .join(broadcast(m.codebooks), Seq("grp", "code"))
      .withColumn("_pd", pd)
      .groupBy(col(idCol))
      .agg(sum(col("_pd")).as("_s"))
      .select(col(idCol), round(sqrt(col("_s")), roundTo).as("score"))
      .orderBy(col("score"), col(idCol))
      .limit(topK)
  }

  /** Live-index insert for the composed index: route each new vector
    * through the FROZEN coarse quantizer (argmin-l2 centroid), encode
    * with the FROZEN codebooks, union — map-only against the new batch
    * plus one tiny broadcast, no retrain, no touch of existing codes.
    * `residual = true` encodes x - centroid(x) instead of x, matching
    * a [[buildResidual]] index (the append must mirror the encode the
    * index was built with or ADC scores are garbage).
    */
  def appendToIndex(index: Index, newRows: DataFrame, idCol: String,
      vecCol: String, residual: Boolean = false): Index = {
    val tagged = Ann.tagCorpus(newRows, idCol, vecCol, index.centroids)
    val newCodes =
      if (residual) {
        val resid = tagged.join(broadcast(index.centroids), Seq("cluster"))
          .select(col(idCol), col("cluster"),
            zip_with(col(vecCol), col("centroid"),
              (x, c) => x.cast("double") - c).as("_r"))
        Pq.encode(index.model, resid, idCol, "_r")
          .join(resid.select(col(idCol), col("cluster")), Seq(idCol))
      } else
        Pq.encode(index.model, newRows, idCol, vecCol)
          .join(tagged.select(col(idCol), col("cluster")), Seq(idCol))
    Index(index.centroids, index.model, index.codes.unionByName(newCodes))
  }

  /** Live-index delete: anti-join the doomed ids out of the codes.
    * Remaining rows keep their cluster, so an at-rest
    * partitionBy("cluster") layout stays valid (only rewritten
    * partitions change) — same contract as Ann.deleteFromIvf.
    */
  def deleteFromIndex(index: Index, idCol: String,
      doomed: DataFrame): Index =
    Index(index.centroids, index.model,
      index.codes.join(doomed.select(col(idCol)), Seq(idCol), "left_anti"))

  /** At-rest layout: codes partitionBy(cluster) + centroids +
    * codebooks/params (reusing the PQ index layout for the latter).
    */
  def writeIndex(index: Index, path: String): Unit = {
    index.codes.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$path/codes")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Pq.writeModel(index.model, index.codes.sparkSession, path)
  }

  def loadIndex(spark: SparkSession, path: String): Index =
    Index(
      spark.read.parquet(s"$path/centroids"),
      Pq.loadModel(spark, path),
      spark.read.parquet(s"$path/codes"))
}
