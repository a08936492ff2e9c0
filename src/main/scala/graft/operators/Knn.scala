package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFunctions}

/** Flat (exact) k-nearest-neighbour search, Spark-first.
  *
  * Reference behavior: /root/reference/pkg/index/flat/flat.go computes
  * the metric against every stored vector, sorts, truncates to k. Here
  * the corpus is a DataFrame and `orderBy(dist).limit(k)` compiles to
  * `TakeOrderedAndProject`: a per-partition bounded heap followed by a
  * driver-side merge of k rows per partition — no global sort, no
  * corpus shuffle, linear scale-out with executors.
  *
  * Distances are rounded to `roundTo` decimals BEFORE ordering and ties
  * are broken by the id column, so results are deterministic and
  * reproducible across engines (the DuckDB oracle orders identically).
  */
object Knn {

  val DefaultRound = 4

  /** Exact top-k for a single query vector column expression.
    *
    * @param corpus  DataFrame holding `idCol` and `vecCol`
    * @param query   single-row DataFrame with the query vector as `qvec`
    * @param metric  euclidean | cosine | dotproduct | manhattan
    */
  def topK(
      corpus: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      metric: String,
      k: Int,
      roundTo: Int = DefaultRound): DataFrame = {
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    corpus
      .crossJoin(broadcast(query))
      .select(col(idCol), round(d, roundTo).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Radius (range) search: ALL corpus rows within `radius` of the
    * query, nearest first — the "every vector closer than r" contract
    * (ε-NN) that pairs with top-k in most vector stores. Map-only
    * filter + TakeOrdered on the (small) survivor set; the predicate
    * evaluates inside whole-stage codegen next to the scan, so at
    * scale this reads the corpus once and shuffles only matches.
    * `maxRows` bounds the result (a loose radius must not collect an
    * unbounded set to the driver).
    */
  def radiusSearch(
      corpus: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      metric: String,
      radius: Double,
      maxRows: Int = 1000,
      roundTo: Int = DefaultRound): DataFrame = {
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    corpus
      .crossJoin(broadcast(query))
      .select(col(idCol), round(d, roundTo).as("dist"))
      .where(col("dist") <= radius)
      .orderBy(col("dist"), col(idCol))
      .limit(maxRows)
  }

  /** Faceted top-k: the query's nearest `k` within EACH value of
    * `groupCol` (per-label / per-source retrieval — "best matches from
    * every shard of the catalog", the diversified-results contract a
    * plain top-k can't give when one dense group dominates). One
    * corpus scan; the per-group cut runs as WindowGroupLimit partials
    * BEFORE the group exchange, so only k rows per partition per
    * group shuffle — the grouped twin of [[topK]]'s
    * TakeOrderedAndProject (plan-guarded like embed_outliers).
    */
  def topKPerGroup(
      corpus: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      metric: String,
      k: Int,
      roundTo: Int = DefaultRound): DataFrame = {
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col("qvec"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("dist"), col(idCol))
    corpus
      .crossJoin(broadcast(query))
      .select(col(groupCol), col(idCol), round(d, roundTo).as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(groupCol), col(idCol), col("dist"))
      .orderBy(col(groupCol), col("dist"), col(idCol))
  }

  /** Batch kNN: every row of `queries` gets its own top-k from `corpus`.
    *
    * The query set is broadcast (q << corpus); the corpus is scanned
    * once. Per-query top-k goes through the TopKPairs
    * TypedImperativeAggregate: each map task reduces its partition to
    * <= k pairs per query BEFORE the shuffle, so the exchange carries
    * q*k*partitions rows — not the q*|corpus| a rank window would
    * shuffle. Output: (qid, id, dist, rank).
    */
  def knnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      metric: String,
      k: Int,
      excludeSelf: Boolean = true,
      roundTo: Int = DefaultRound): DataFrame =
    knnPairs(corpus, queries, idCol, vecCol, qidCol, qvecCol, metric,
      excludeSelf, roundTo)
      .groupBy(col(qidCol))
      .agg(TopKAgg.topk_pairs(col("dist"), col(idCol), k).as("topk"))
      .select(col(qidCol), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col(qidCol), col(s"pair.id").as(idCol),
        col("pair.dist").as("dist"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col(qidCol), col("rank"))

  /** Rank-window formulation of knnJoin — same semantics, shuffles
    * every candidate pair; kept as the executable spec the aggregate
    * version is tested against.
    */
  def knnJoinWindow(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      metric: String,
      k: Int,
      excludeSelf: Boolean = true,
      roundTo: Int = DefaultRound): DataFrame = {
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist"), col(idCol))
    knnPairs(corpus, queries, idCol, vecCol, qidCol, qvecCol, metric,
        excludeSelf, roundTo)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col(qidCol), col("rank"))
  }

  private def knnPairs(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      qidCol: String, qvecCol: String, metric: String,
      excludeSelf: Boolean, roundTo: Int): DataFrame = {
    val d = VectorFunctions.forMetric(metric)(col(vecCol), col(qvecCol))
    corpus
      .crossJoin(broadcast(queries))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .select(col(qidCol), col(idCol), round(d, roundTo).as("dist"))
  }
}
