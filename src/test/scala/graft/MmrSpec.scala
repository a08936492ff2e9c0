package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Knn, Mmr}

class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  def corpus = Tables.load(spark, sf, "embeddings")
  def q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))

  test("returns k rows with distinct ids and ranks 1..k; rank 1 is flat top-1") {
    val res = Mmr.diversify(corpus, q, "vec_id", "embedding",
      k = 5, poolSize = 20).collect()
    assert(res.length == 5)
    assert(res.map(_.getLong(0)).distinct.length == 5)
    assert(res.map(_.getInt(1)).toSeq == (1 to 5))
    val top1 = Knn.topK(corpus, q, "vec_id", "embedding", "cosine", 1)
      .head.getLong(0)
    assert(res.head.getLong(0) == top1)
  }

  test("with zero diversity weight MMR degenerates to flat top-k") {
    val mmr = Mmr.diversify(corpus, q, "vec_id", "embedding",
      k = 5, poolSize = 20, lambdaRel = 1.0, lambdaDiv = 0.0)
      .collect().map(_.getLong(0)).toSeq
    val flat = Knn.topK(corpus, q, "vec_id", "embedding", "cosine", 5)
      .collect().map(_.getLong(0)).toSeq
    assert(mmr == flat)
  }

  test("k exceeding the pool yields the whole pool, ranked, no error") {
    // 3-row corpus, poolSize 3, k 5: steps 4..5 see an empty
    // candidate set (limit(1) of empty stays empty; same in the
    // oracle's pick_j CTE), so exactly 3 ranked rows come back
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val qv = spark.range(1).select(array(lit(1f), lit(0f)).as("qvec"))
    val res = Mmr.diversify(df, qv, "vec_id", "embedding",
      k = 5, poolSize = 3).collect()
    assert(res.length == 3)
    assert(res.map(_.getInt(1)).toSeq == (1 to 3))
    assert(res.map(_.getLong(0)).distinct.length == 3)
  }

  test("an exact duplicate of the top hit is demoted below distinct results") {
    // query sits between two axis clusters; the best hit C has an
    // exact copy. Flat top-3 keeps the copy at rank 2; MMR replaces
    // it with the axis vectors (relevant but diverse).
    val df = Seq(
      0L  -> Array(1f, 0f, 0f, 0f), // axis A
      1L  -> Array(0f, 1f, 0f, 0f), // axis B
      2L  -> Array(1f, 1f, 1f, 0f), // C: most relevant to q
      99L -> Array(1f, 1f, 1f, 0f)  // exact duplicate of C
    ).map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
    val qv = spark.range(1).select(
      array(lit(1f), lit(1f), lit(0f), lit(0f)).as("qvec"))
    val flat = Knn.topK(df, qv, "vec_id", "embedding", "cosine", 3)
      .collect().map(_.getLong(0)).toSeq
    assert(flat.take(2) == Seq(2L, 99L)) // duplicate rides shoulder
    val mmr = Mmr.diversify(df, qv, "vec_id", "embedding",
      k = 3, poolSize = 4).collect().map(_.getLong(0)).toSeq
    assert(mmr == Seq(2L, 0L, 1L), s"mmr=$mmr")
  }
}
