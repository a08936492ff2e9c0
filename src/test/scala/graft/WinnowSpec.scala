package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup}

/** Winnowing (Schleimer/Wilkerson/Aiken) contracts: the match
  * guarantee, the density bound, and the rightmost-tie pin.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("constant text: every window picks its rightmost pos, density 1.0") {
    // all shingles hash identically, so each of the m-w+1 windows
    // selects a DISTINCT rightmost position: n_fp = m-w+1 exactly
    val df = Seq((0L, Seq.fill(10)("a").mkString(" "))).toDF("doc_id", "text")
    val s = Corpus.winnowSummary(df, "text", "doc_id").collect().head
    assert(s.getLong(1) == 8L)        // 10 tokens -> 8 3-shingles
    assert(s.getLong(2) == 5L)        // 8 - 4 + 1 window starts
    assert(s.getDouble(3) == 1.0)
  }

  test("match guarantee: docs sharing a w+k-1 token run share a fingerprint") {
    // shared run of 6 tokens = 4 consecutive identical shingle hashes
    // = one full window -> same rightmost-min hash selected in both
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = s"one two three four five $shared six seven eight nine"
    val b = s"red orange yellow green blue $shared indigo violet pink black"
    val df = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val fa = Corpus.winnowFingerprints(df.where(col("doc_id") === 0), "text", "doc_id")
      .select("fp").as[Long].collect().toSet
    val fb = Corpus.winnowFingerprints(df.where(col("doc_id") === 1), "text", "doc_id")
      .select("fp").as[Long].collect().toSet
    assert((fa & fb).nonEmpty)
    // and the pair generator finds it from the joint frame (minShared
    // lowered to 1: a single shared window guarantees ONE fingerprint)
    val pairs = Dedup.winnowPairs(df, "text", "doc_id", minShared = 1)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
  }

  test("density on random corpus text tracks the ~2/(w+1) expectation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val d = Corpus.winnowSummary(docs, "text", "doc_id")
      .agg(avg(col("density"))).collect().head.getDouble(0)
    // 2/(w+1) = 0.4 for w=4; word-salad repetition pushes it around a
    // bit, but it must stay well below 1.0 (selective) and above the
    // 1/w floor (every window selects something)
    assert(d > 0.25 && d < 0.6, s"mean density $d")
  }

  test("winnowRecallMatrix: monotone frontier — higher min_shared never predicts more") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = Dedup.winnowRecallMatrix(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 3)
    // configs sort ascending by min_shared; n_pred and n_hit are
    // non-increasing in the threshold, n_true constant
    assert(rows.map(_._2).distinct.length == 1)
    val preds = rows.map(_._3)
    val hits = rows.map(_._4)
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
    assert(hits.zip(hits.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r._4 <= r._3))
  }

  test("short docs (< window shingles) emit no fingerprints, appear in no summary") {
    val df = Seq((0L, "a b c d e")).toDF("doc_id", "text") // 3 shingles < w=4
    assert(Corpus.winnowFingerprints(df, "text", "doc_id").count() == 0)
    assert(Corpus.winnowSummary(df, "text", "doc_id").count() == 0)
  }
}
