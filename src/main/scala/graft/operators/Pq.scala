package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      centroids = assigned
        .select(col("grp"), col("code"), posexplode(col("_v")))
        .groupBy(col("grp"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mval"))
        .groupBy(col("grp"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mval")))),
          s => s.getField("mval")).as("centroid"))
      centroids = centroids.localCheckpoint(eager = true)
    }
    centroids
  }

  /** Argmin-centroid code per (grp, _id) via broadcast join + rank. */
  private def assignCodes(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("grp"), col("_id"))
      .orderBy(col("_d"), col("code"))
    vecs.join(broadcast(centroids), Seq("grp"))
      .withColumn("_d", VectorFunctions.vec_l2(col("_v"), col("centroid")))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_d", "_rn", "centroid")
  }

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
    * per subspace in id order.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, k: Int = 16, iters: Int = 3): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val cb = groupedKmeans(subvectors(corpus, idCol, vecCol, m, subDim), k, iters)
    Model(m, k, subDim, cb.localCheckpoint(eager = true))
  }

  /** Encode: (id, codes array<int> of length m). */
  def encode(model: Model, corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    assignCodes(
      subvectors(corpus, idCol, vecCol, model.m, model.subDim), model.codebooks)
      .groupBy(col("_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("grp"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select(col("_id").as(idCol), col("codes"))

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
}
