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
