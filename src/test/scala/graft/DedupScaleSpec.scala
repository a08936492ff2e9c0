package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}

/** Scale properties of the LSH-bucketed embedding dedup: the plane
  * count adapts to corpus size (bounded expected bucket size), and
  * the salt-grid task guard never changes results.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("adaptivePlanes: integer-exact, grows with n, bounded") {
    // min p with 2^p * target >= n — same formula the DuckDB oracle
    // computes (no fp log2 on either side)
    assert(Dedup.adaptivePlanes(10) == 1)
    assert(Dedup.adaptivePlanes(64) == 1)    // 2*32 >= 64
    assert(Dedup.adaptivePlanes(65) == 2)
    assert(Dedup.adaptivePlanes(500) == 4)   // sf0.001/0.01 embeddings
    assert(Dedup.adaptivePlanes(2000) == 6)  // sf0.1 embeddings
    assert(Dedup.adaptivePlanes(2048) == 6)  // exact power boundary
    assert(Dedup.adaptivePlanes(2049) == 7)
    assert(Dedup.adaptivePlanes(Int.MaxValue.toLong * 64) == 30) // cap
    // doubling the corpus adds ~1 plane: expected bucket size is flat
    assert(Dedup.adaptivePlanes(4000) == Dedup.adaptivePlanes(2000) + 1)
  }

  test("adaptive planes bound the max bucket (task-size guard input)") {
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.count()
    val planes = Dedup.adaptivePlanes(n, targetBucket = 32)
    val sizes = e
      .select(Ann.lshSignature(col("embedding"), planes).as("bucket"))
      .groupBy(col("bucket")).count()
      .select(max(col("count")).as("mx"), count(lit(1)).as("nb"))
      .head()
    val maxBucket = sizes.getLong(0)
    // random-hyperplane buckets are skewed but bounded: the densest
    // bucket stays within a small factor of the 32-row target (measured
    // 98 at sf0.001, 181 at sf0.1) — a fixed plane count would instead
    // let this grow linearly with the corpus
    assert(maxBucket <= 8 * 32, s"max bucket $maxBucket > 8x target")
    assert(sizes.getLong(1) <= (1L << planes))
  }

  test("salt-grid pair generation is output-invariant (s=1 == s=4)") {
    val e = Tables.load(spark, sf, "embeddings")
    // k large enough to keep EVERY candidate pair: the full pair sets
    // must match, not just the top-k prefix
    val plain = Dedup.lshClosestPairs(e, "vec_id", "embedding", 1000000,
      saltBuckets = 1).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val salted = Dedup.lshClosestPairs(e, "vec_id", "embedding", 1000000,
      saltBuckets = 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(plain.length == salted.length && plain.length > 0)
    assert(plain.sorted.sameElements(salted.sorted))
  }

  test("salt-grid joins on (bucket, ga, gb): dense-bucket work is split") {
    val e = Tables.load(spark, sf, "embeddings")
    val plan = Dedup.lshClosestPairs(e, "vec_id", "embedding", 20,
      saltBuckets = 4).queryExecution.executedPlan.toString
    // the equi-join key must carry the grid cell, not just the bucket —
    // that's what turns one dense bucket into s^2 bounded tasks
    assert(plan.contains("ga") && plan.contains("gb"), plan)
  }

  test("winnowPairs df cap: fingerprints in >maxDf docs pair nobody") {
    val spark2 = spark
    import spark2.implicits._
    // 60 IDENTICAL docs: every fingerprint has df=60, so with the cap
    // at 50 every hash is boilerplate-dropped and no pair survives;
    // with the cap lifted the same hashes fan out to all 60C2 pairs —
    // the exact df² blowup the cap bounds to maxDf²
    val boiler = "terms of service apply to all content here and there"
    val docs = (0 until 60).map(i => (i.toLong, boiler))
      .toDF("doc_id", "text")
    val capped = graft.operators.Dedup
      .winnowPairs(docs, "text", "doc_id", maxDf = 50, minShared = 1)
    assert(capped.count() == 0)
    val uncapped = graft.operators.Dedup
      .winnowPairs(docs, "text", "doc_id", maxDf = 1000, minShared = 1)
    assert(uncapped.count() == 60L * 59 / 2)
  }
}
