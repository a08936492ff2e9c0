package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
  * diversified top-k. Greedily select the candidate maximizing
  *
  *   score(d) = lambdaRel * sim(q, d) - lambdaDiv * max_{s in S} sim(d, s)
  *
  * so each pick is relevant to the query but far from everything
  * already picked — the de-redundancy re-rank step of a retrieval
  * stack (and of diverse training-batch selection).
  *
  * Scale shape: the corpus-sized work is ONE map-only scan feeding a
  * TakeOrderedAndProject heap that produces the `poolSize`-row
  * candidate pool; the greedy loop then runs entirely on that pool
  * (bounded by poolSize, not data) as k chained lazy steps — each an
  * anti-join + broadcast pairwise-sim + one-row TakeOrdered over
  * <= poolSize rows. Pool and growing selection are
  * localCheckpoint'ed, so the step DAG stays linear in k instead of
  * doubling per step. No corpus shuffle anywhere.
  *
  * Determinism: both sims round to 4 dp BEFORE the greedy argmax and
  * every ordering tie-breaks by id, so the whole greedy trajectory is
  * replayable — the DuckDB oracle unrolls the same k steps as a CTE
  * chain and hash-matches (same doubles, same ops, same order).
  */
object Mmr {

  /** Cosine SIMILARITY matching the `vec_cosine` distance kernel:
    * 1 - dist, i.e. clamp(dot/(|a||b|)) with zero-vector -> 0. */
  private def cosSim(a: Column, b: Column): Column =
    lit(1.0) - VectorFunctions.vec_cosine(a, b)

  /** Diversified top-k of `corpus` for the one-row `query` (qvec).
    * Returns (idCol, rank 1..k, rel) in selection order. */
  def diversify(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, k: Int, poolSize: Int,
      lambdaRel: Double = 0.7, lambdaDiv: Double = 0.3,
      roundTo: Int = 4): DataFrame = {
    // corpus-sized stage: top-poolSize by (rounded) query similarity
    val pool = corpus.crossJoin(broadcast(query))
      .select(col(idCol).as("_mid"), col(vecCol).as("_mv"),
        round(cosSim(col(vecCol), col("qvec")), roundTo).as("_rel"))
      .orderBy(col("_rel").desc, col("_mid"))
      .limit(poolSize)
      .coalesce(1) // <= poolSize rows: one checkpoint partition
      .localCheckpoint()

    var sel = pool.orderBy(col("_rel").desc, col("_mid")).limit(1)
      .withColumn("_rank", lit(1))
      .coalesce(1)
      .localCheckpoint()
    var j = 2
    while (j <= k) {
      val s = sel.select(col("_mid").as("_sid"), col("_mv").as("_sv"))
      val scored = pool
        .join(broadcast(sel.select(col("_mid"))), Seq("_mid"), "left_anti")
        .crossJoin(broadcast(s))
        .groupBy(col("_mid"), col("_mv"), col("_rel"))
        .agg(max(round(cosSim(col("_mv"), col("_sv")), roundTo)).as("_ms"))
        .select(col("_mid"), col("_mv"), col("_rel"),
          (lit(lambdaRel) * col("_rel") - lit(lambdaDiv) * col("_ms")).as("_score"))
      val next = scored.orderBy(col("_score").desc, col("_mid")).limit(1)
        .select(col("_mid"), col("_mv"), col("_rel"))
        .withColumn("_rank", lit(j))
      sel = sel.unionByName(next).coalesce(1).localCheckpoint()
      j += 1
    }
    sel.select(col("_mid").as(idCol), col("_rank").as("rank"), col("_rel").as("rel"))
      .orderBy(col("rank"))
  }
}
