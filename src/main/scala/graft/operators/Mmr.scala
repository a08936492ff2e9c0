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
  * candidate pool; the greedy loop then runs DRIVER-SIDE on the
  * collected pool (the collect is bounded by poolSize — an explicit
  * parameter, never data-sized), k·poolSize pairwise sims over rows
  * already in memory. The previous shape ran the same loop as k
  * chained lazy Spark steps (anti-join + broadcast sim + one-row
  * TakeOrdered, each localCheckpoint'ed): identical results, but k
  * extra jobs of pure scheduling overhead for a frame that fits in a
  * hand. No corpus shuffle anywhere either way.
  *
  * Determinism: both sims round to 4 dp BEFORE the greedy argmax and
  * every ordering tie-breaks by id, so the whole greedy trajectory is
  * replayable — the DuckDB oracle unrolls the same k steps as a CTE
  * chain and hash-matches. Zero cross-path drift by construction: the
  * driver loop evaluates the SAME Catalyst kernel (`VectorDistance`,
  * interpreted eval — spec-pinned equal to its codegen path) and the
  * SAME HALF_UP rounding Spark's `round` applies to doubles.
  */
object Mmr {

  /** Cosine SIMILARITY matching the `vec_cosine` distance kernel:
    * 1 - dist, i.e. clamp(dot/(|a||b|)) with zero-vector -> 0. */
  private def cosSim(a: Column, b: Column): Column =
    lit(1.0) - VectorFunctions.vec_cosine(a, b)

  /** Spark `round(col, n)` on DoubleType: HALF_UP over
    * BigDecimal.valueOf (shortest decimal repr) — replicated exactly
    * so the driver-side greedy emits the bits the oracle expects. */
  private def roundHalfUp(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Diversified top-k of `corpus` for the one-row `query` (qvec).
    * Returns (idCol, rank 1..k, rel) in selection order. */
  def diversify(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, k: Int, poolSize: Int,
      lambdaRel: Double = 0.7, lambdaDiv: Double = 0.3,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    import graft.functions.VectorDistance

    val spark = corpus.sparkSession
    // corpus-sized stage: top-poolSize by (rounded) query similarity,
    // a TakeOrderedAndProject heap — THE distributed work
    val pool = corpus.crossJoin(broadcast(query))
      .select(col(idCol).as("_mid"), col(vecCol).as("_mv"),
        round(cosSim(col(vecCol), col("qvec")), roundTo).as("_rel"))
      .orderBy(col("_rel").desc, col("_mid"))
      .limit(poolSize)
    val mvType = pool.schema("_mv").dataType
    val idType = pool.schema("_mid").dataType
    val rows = pool.collect() // bounded by poolSize, already ordered

    def litVec(v: Any): Literal = {
      val arr = v.asInstanceOf[scala.collection.Seq[Any]].toArray
      Literal(ArrayData.toArrayData(arr), mvType)
    }
    def sim(a: Any, b: Any): Double = roundHalfUp(
      1.0 - VectorDistance(litVec(a), litVec(b), "cosine")
        .eval(null).asInstanceOf[Double], roundTo)
    def idLt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long)     => x < y
      case (x: Int, y: Int)       => x < y
      case (x: String, y: String) => x < y
      case (x: Number, y: Number) => x.doubleValue() < y.doubleValue()
      case _ => a.toString < b.toString
    }

    // greedy over the in-memory pool: pick argmax score, ties by id
    val selected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var remaining = rows.toVector
    while (selected.size < k && remaining.nonEmpty) {
      val best =
        if (selected.isEmpty) remaining.head // pool pre-sorted (_rel desc, _mid)
        else remaining
          .map { r =>
            val ms = selected.map(s => sim(r.get(1), s.get(1))).max
            (r, lambdaRel * r.getDouble(2) - lambdaDiv * ms)
          }
          .reduceLeft { (p, q) =>
            if (q._2 > p._2 ||
              (q._2 == p._2 && idLt(q._1.get(0), p._1.get(0)))) q else p
          }._1
      selected += best
      remaining = remaining.filterNot(_.get(0) == best.get(0))
    }

    val outSchema = StructType(Seq(
      StructField(idCol, idType), StructField("rank", IntegerType, false),
      StructField("rel", DoubleType)))
    val out = selected.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i + 1, r.getDouble(2))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.BufferHasAsJava(out).asJava),
      outSchema)
      .orderBy(col("rank"))
  }
}
