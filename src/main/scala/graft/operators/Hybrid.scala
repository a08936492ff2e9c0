package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (lexical + vector) retrieval with reciprocal-rank fusion —
  * the RAG serving pattern layered on the engine's existing rankers.
  *
  * Scale shape: each ranker reduces the corpus to its top-C with a
  * TakeOrderedAndProject (per-partition heap, no corpus shuffle);
  * ranking and fusion then touch only 2C rows. The global
  * row_number() windows run AFTER the limit, so the "sort the whole
  * corpus to rank it" trap never materializes — C is a constant,
  * independent of corpus size.
  */
object Hybrid {

  /** Top-C of `df` under `order`, with a dense 1..C rank attached.
    * The window is global but runs over <= C rows (post-limit). */
  def rankTopC(df: DataFrame, order: Seq[Column], c: Int,
      rankName: String): DataFrame =
    df.orderBy(order: _*).limit(c)
      .withColumn(rankName,
        row_number().over(Window.orderBy(order: _*)))

  /** Min-max weighted score fusion — the score-aware alternative to
    * RRF: each ranker's top-C scores normalize to [0,1] over ITS OWN
    * list (min-max), fused = wLex*n_lex + wVec*n_vec, docs missing
    * from a ranker contribute 0 there. Unlike RRF this preserves
    * score GAPS (a runaway best hit stays runaway), at the cost of
    * sensitivity to each ranker's score distribution.
    *
    * `lex` is a (idCol, score) higher-is-better top-C list; `vec` a
    * (idCol, dist) lower-is-better one. All normalized values round
    * to 6 dp BEFORE weighting, so the fused ordering is replayable in
    * the DuckDB oracle. Degenerate constant lists normalize to 1.0.
    * Everything past the two top-C heaps touches <= 2C rows.
    */
  def minMaxFuse(lex: DataFrame, vec: DataFrame, idCol: String,
      wLex: Double, wVec: Double, topK: Int, roundTo: Int = 6): DataFrame = {
    val lmm = lex.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
    val vmm = vec.agg(min(col("dist")).as("mn"), max(col("dist")).as("mx"))
    val nl = lex.crossJoin(broadcast(lmm)).select(col(idCol),
      round(when(col("mx") === col("mn"), lit(1.0))
        .otherwise((col("score") - col("mn")) / (col("mx") - col("mn"))),
        roundTo).as("n_lex"))
    val nv = vec.crossJoin(broadcast(vmm)).select(col(idCol),
      round(when(col("mx") === col("mn"), lit(1.0))
        .otherwise((col("mx") - col("dist")) / (col("mx") - col("mn"))),
        roundTo).as("n_vec"))
    nl.join(nv, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("n_lex"), lit(0.0)).as("n_lex"),
        coalesce(col("n_vec"), lit(0.0)).as("n_vec"))
      .withColumn("fused",
        round(lit(wLex) * col("n_lex") + lit(wVec) * col("n_vec"), roundTo))
      .orderBy(col("fused").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion: rrf(d) = sum_i 1/(k0 + rank_i(d)),
    * with docs missing from a ranker charged rank C+1. k0=60 is the
    * standard damping (Cormack et al.). Expects `a`/`b` as
    * (idCol, rankA/rankB) top-C lists; the fusion join touches only
    * 2C rows. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      rankA: String, rankB: String, c: Int, topK: Int,
      k0: Int = 60, roundTo: Int = 6): DataFrame =
    a.select(col(idCol), col(rankA))
      .join(b.select(col(idCol), col(rankB)), Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col(rankA), lit(c + 1)).as(rankA),
        coalesce(col(rankB), lit(c + 1)).as(rankB))
      .withColumn("rrf", round(
        lit(1.0) / (lit(k0) + col(rankA)) + lit(1.0) / (lit(k0) + col(rankB)),
        roundTo))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
}
