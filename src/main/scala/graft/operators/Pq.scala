package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product Quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the classic vector-DB
  * compression: split each d-dim vector into `m` subvectors, k-means
  * each subspace to `k` codes, store only the m code ids (d floats ->
  * m small ints; 64 floats -> 8 bytes at k<=256). Search scores a
  * query against the codes via an Asymmetric Distance Computation
  * table without touching the original vectors.
  *
  * Spark-first shape: all m subspace k-means run as ONE grouped
  * pipeline per iteration (group = subspace id), not m driver loops;
  * the ADC table (m*k doubles) is collected once per query and folded
  * into a literal-array column expression, so scoring is a codegen'd
  * per-row lookup-sum with no join against the table.
  */
object Pq {

  case class Model(m: Int, k: Int, subDim: Int, codebooks: DataFrame)

  /** Grouped Lloyd's: one k-means per `grp` value, all groups in the
    * same jobs. Input: (grp: int, _id: long, _v: array<double>).
    * Output: (grp, code, centroid).
    */
  private def groupedKmeans(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val seedW = Window.partitionBy(col("grp")).orderBy(col("_id"))
    var centroids = vecs
      .withColumn("_rn", row_number().over(seedW))
      .where(col("_rn") <= k)
      .select(col("grp"), (col("_rn") - 1).as("code"), col("_v").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignCodes(vecs, centroids)
      // round(…, 6) snaps codebook entries to the 1e-6 grid each
      // iteration so partition-order fp drift can't accumulate — the
      // same engine-portability contract as Ann.lloyd, which is what
      // lets ann_pq be oracled via SparkEntry.pqKmeansCtes
      centroids = assigned
        .select(col("grp"), col("code"), posexplode(col("_v")))
        .groupBy(col("grp"), col("code"), col("pos"))
        .agg(round(avg(col("col")), 6).as("mval"))
        .groupBy(col("grp"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mval")))),
          s => s.getField("mval")).as("centroid"))
      // m*k rows -> ONE partition before the per-iteration checkpoint
      // (32 near-empty checkpoint tasks per iteration otherwise)
      centroids = centroids.coalesce(1).localCheckpoint(eager = false)
    }
    centroids
  }

  /** Argmin-centroid code per (grp, _id) via broadcast join + `min_by`
    * aggregation: map-side partial agg shrinks the exchange from
    * n×m×k candidate rows (the row_number() window form) to n×m.
    * Ties break as before: (distance, code) ascending.
    */
  private def assignCodes(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.join(broadcast(centroids), Seq("grp"))
      .withColumn("_d", VectorFunctions.vec_l2(col("_v"), col("centroid")))
      .groupBy(col("grp"), col("_id"))
      .agg(min_by(
        struct(col("code"), col("_v")),
        struct(col("_d"), col("code"))).as("_m"))
      .select(col("grp"), col("_id"),
        col("_m.code").as("code"), col("_m._v").as("_v"))

  /** Rows of (grp, _id, subvector) for every subspace. */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    corpus.select(col(idCol).as("_id"),
        explode(transform(sequence(lit(0), lit(m - 1)), g =>
          struct(g.as("grp"),
            transform(slice(col(vecCol), g * subDim + 1, lit(subDim)),
              _.cast("double")).as("sv")))).as("e"))
      .select(col("e.grp").as("grp"), col("_id"), col("e.sv").as("_v"))

  /** Train codebooks. Deterministic: seeded from the first k vectors
    * per subspace in id order. `trainSampleMod > 1` runs Lloyd's on
    * the deterministic `id % trainSampleMod == 0` sample only —
    * codebooks need ~100k training vectors, so at 100 TB the sample is
    * the difference between a feasible build and a non-starter; the
    * full corpus is still ENCODED in one map-side pass afterwards.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, k: Int = 16, iters: Int = 3,
      trainSampleMod: Long = 1): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sample =
      if (trainSampleMod > 1) corpus.where(col(idCol) % trainSampleMod === 0)
      else corpus
    val cb = groupedKmeans(subvectors(sample, idCol, vecCol, m, subDim), k, iters)
    Model(m, k, subDim, cb.coalesce(1).localCheckpoint(eager = false))
  }

  /** Codebooks WITHOUT k-means: entry (g, c) is subvector g of the
    * corpus vector with id c (ids 0..k-1 must exist). Deterministic
    * and SQL-expressible, so the whole encode + ADC path can be
    * DuckDB-oracled (`ann_pq_static`) — the same trick
    * `ann_ivf_static` uses for IVF; only Lloyd's itself stays under
    * the weaker rows-only check.
    */
  /** OPQ-style deterministic dimension permutation (the permutation
    * special case of Ge et al.'s Optimized Product Quantization,
    * CVPR'13): rank dimensions by per-dimension variance and deal
    * them to the m subspaces in a SNAKE draft (rank r → subspace
    * r%m on even passes, m-1-r%m on odd), so every subquantizer sees
    * a comparable share of the cloud's energy instead of whatever
    * contiguous slice the storage order happened to give it. A float
    * rotation matrix would beat it on correlated data but is not
    * integer-oracle-able; the permutation is — variance numerators
    * are EXACT integers over e3-quantized values (n·Σq² − (Σq)²),
    * ranking ties break by dimension index, and the snake is closed
    * form, so an independent engine replays the identical order.
    *
    * One map-side (dim)-keyed aggregate over the corpus (the same
    * shape as the SQ range scan); the returned order is |dims| ints —
    * model-sized by construction. Returns the permuted dimension
    * order: position p of the permuted vector reads original
    * dimension order(p).
    */
  def varianceSnakeOrder(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int): Seq[Int] = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("vn").desc, col("j"))
    // global window is fine: the frame is |dims| rows (vocab_coverage
    // bounded-frame precedent), never corpus-sized
    corpus.select(posexplode(
        transform(col(vecCol), x => round(x.cast("double") * 1000)
          .cast("long"))).as(Seq("j", "q")))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      // DECIMAL(38,0) for the numerator: n·Σq² is ~n²·q² and wraps
      // Long silently past n ≈ 10^7 vectors; at ≤ 2.5e29 for n = 1e12,
      // e3 inputs it fits decimal(38) with exactness intact (DuckDB
      // reaches the same values through HUGEINT)
      .select(col("j"),
        (col("n").cast("decimal(19,0)") * col("sqq").cast("decimal(19,0)")
          - col("sq").cast("decimal(19,0)") * col("sq").cast("decimal(19,0)"))
          .as("vn"))
      .withColumn("r", row_number().over(w) - 1)
      .select(col("j"),
        when(pmod(col("r"), lit(2L * m)) < m, pmod(col("r"), lit(m.toLong)))
          .otherwise(lit(m - 1) - pmod(col("r"), lit(m.toLong))).as("grp"),
        col("r"))
      .orderBy(col("grp"), col("r"))
      .select(col("j"))
      .collect().map(_.getInt(0)).toSeq
  }

  def staticCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, k: Int = 16): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val cb = subvectors(corpus.where(col(idCol) < k), idCol, vecCol, m, subDim)
      .select(col("grp"), col("_id").cast("int").as("code"),
        col("_v").as("centroid"))
    Model(m, k, subDim, cb)
  }

  /** Persist a PQ index to parquet: `path`/codes (the 8-byte-per-
    * vector table — at 100 TB this is the ONLY full-corpus artifact a
    * search scans, 32x smaller than the vectors), `path`/codebooks
    * (m*k tiny rows) and `path`/params. The at-rest serving layout
    * for [[searchAdc]]'s map-only scoring.
    */
  def writeIndex(model: Model, codes: DataFrame, path: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$path/codes")
    writeModel(model, codes.sparkSession, path)
  }

  /** Codebooks + params persistence shared by the plain-PQ and IVF-PQ
    * index layouts (one schema, one loader — they can't drift).
    */
  def writeModel(model: Model, spark: SparkSession, path: String): Unit = {
    model.codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
    import spark.implicits._
    Seq((model.m, model.k, model.subDim)).toDF("m", "k", "subDim")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val p = spark.read.parquet(s"$path/params").head()
    Model(p.getAs[Int]("m"), p.getAs[Int]("k"), p.getAs[Int]("subDim"),
      spark.read.parquet(s"$path/codebooks"))
  }

  /** Load a persisted PQ index: (model, codes). Codebooks stay a
    * DataFrame (collected lazily by the serving path that needs the
    * literal table).
    */
  def loadIndex(spark: SparkSession, path: String): (Model, DataFrame) =
    (loadModel(spark, path), spark.read.parquet(s"$path/codes"))

  /** Encode: (id, codes array<int> of length m). */
  def encode(model: Model, corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    assignCodes(
      subvectors(corpus, idCol, vecCol, model.m, model.subDim), model.codebooks)
      .groupBy(col("_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("grp"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select(col("_id").as(idCol), col("codes"))

  /** Live-index insert: encode new rows with the FROZEN codebooks and
    * union — map-only, no retrain (the storage-Insert path; same
    * contract as Ann.appendToIvf / Sq.appendToIndex / Bq.appendToIndex,
    * closing the one family asymmetry). Codebooks fitted on the old
    * distribution still quantize drifted vectors — they just land on
    * farther centroids — so unlike SQ8 there's no clamp cliff, only a
    * gradual recall fade; recall audits (ann_recall_matrix) are the
    * retrain trigger here.
    */
  def appendToIndex(model: Model, codes: DataFrame, newRows: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    codes.unionByName(encode(model, newRows, idCol, vecCol))

  /** Live-index delete: anti-join the doomed ids out of the codes. */
  def deleteFromIndex(codes: DataFrame, idCol: String,
      doomed: DataFrame): DataFrame =
    codes.join(doomed.select(col(idCol)), Seq(idCol), "left_anti")

  /** ADC top-k: squared-l2 lookup table folded into a literal array;
    * score(row) = sum_g table[g*k + codes[g]]. Returns (id, score)
    * ascending — approximate distances, exact ordering by the codes.
    */
  def searchAdc(model: Model, codes: DataFrame, queryVec: Array[Float],
      idCol: String, topK: Int, roundTo: Int = 4): DataFrame = {
    val q = queryVec.map(_.toDouble)
    val table: Array[Double] = model.codebooks
      .collect() // m*k rows of subDim doubles — tiny, driver-side by design
      .map { r =>
        val g = r.getAs[Int]("grp"); val c = r.getAs[Int]("code")
        val cent = r.getSeq[Double](r.fieldIndex("centroid"))
        var s = 0.0
        var i = 0
        while (i < model.subDim) {
          val dji = q(g * model.subDim + i) - cent(i); s += dji * dji; i += 1
        }
        (g * model.k + c, s)
      }.sortBy(_._1).map(_._2)
    val tLit = typedLit(table.toSeq)
    val score = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
        (code, g) => element_at(tLit, (g * model.k + code).cast("int") + 1)),
      lit(0.0), (a, x) => a + x)
    codes.select(col(idCol), round(sqrt(score), roundTo).as("score"))
      .orderBy(col("score"), col(idCol))
      .limit(topK)
  }

  /** ADC top-k with NO driver-side action on the query path: the
    * query vector stays a (broadcast) one-row DataFrame with column
    * `qvec`, codes are exploded to (id, grp, code) and broadcast-
    * joined to the codebooks, and the per-id score is a map-side-
    * combined sum of per-subspace squared distances. Same answer as
    * [[searchAdc]]; use this form inside composed query plans, the
    * literal-table form for interactive single queries.
    */
  def searchAdcJoin(model: Model, codes: DataFrame, query: DataFrame,
      idCol: String, topK: Int, roundTo: Int = 4): DataFrame = {
    val exploded = codes.select(col(idCol),
      posexplode(col("codes")).as(Seq("grp", "code")))
    // squared sub-distance as an in-index-order fold (mirrors the
    // DuckDB oracle's list_sum(list_transform(...)) exactly)
    val qsub = transform(
      slice(col("qvec"), col("grp") * model.subDim + 1, lit(model.subDim)),
      _.cast("double"))
    val pd = aggregate(
      zip_with(qsub, col("centroid"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    exploded
      .join(broadcast(model.codebooks), Seq("grp", "code"))
      .crossJoin(broadcast(query))
      .withColumn("_pd", pd)
      .groupBy(col(idCol))
      .agg(sum(col("_pd")).as("_s"))
      .select(col(idCol), round(sqrt(col("_s")), roundTo).as("score"))
      .orderBy(col("score"), col(idCol))
      .limit(topK)
  }

  /** ADC shortlist + exact re-rank: scan the 8-byte codes for
    * `candidates` approximate nearest, then compute true distances
    * for only those rows. The production pattern: the full-precision
    * corpus is touched for C rows, not |corpus| — at 100 TB the codes
    * (32x smaller) are the only full scan.
    */
  def searchWithRerank(
      model: Model, codes: DataFrame, corpus: DataFrame,
      queryVec: Array[Float], idCol: String, vecCol: String,
      metric: String, topK: Int, candidates: Int = 100): DataFrame = {
    val shortlist = searchAdc(model, codes, queryVec, idCol, candidates)
      .select(col(idCol))
    val d = VectorFunctions.forMetric(metric)(
      col(vecCol), typedLit(queryVec.toSeq))
    corpus
      .join(broadcast(shortlist), Seq(idCol)) // semi-scan of C ids only
      .select(col(idCol), round(d, 4).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(topK)
  }

  /** Shortlist + re-rank with the query vector staying a (broadcast)
    * one-row DataFrame — fully lazy, no driver-side action anywhere on
    * the query path (the composed-plan twin of [[searchWithRerank]],
    * same relationship searchAdcJoin has to searchAdc). With static
    * codebooks the whole plan is deterministic and DuckDB-oracled
    * (`ann_pq_rerank`).
    */
  def searchWithRerankJoin(
      model: Model, codes: DataFrame, corpus: DataFrame,
      query: DataFrame, idCol: String, vecCol: String,
      metric: String, topK: Int, candidates: Int = 100): DataFrame = {
    val shortlist = searchAdcJoin(model, codes, query, idCol, candidates)
      .select(col(idCol))
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    corpus
      .join(broadcast(shortlist), Seq(idCol))
      .crossJoin(broadcast(query))
      .select(col(idCol), round(d, 4).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(topK)
  }
}
