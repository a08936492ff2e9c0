package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.DedupStream

/** Streaming near-dup delivery: documents arrive in disjoint
  * micro-batches, each checked against the at-rest signature store by
  * incrementalMinhashPairs inside foreachBatch. Because every emitted
  * pair touches the current batch and batches are disjoint, the
  * accumulated pair stream must equal the one-shot batch
  * minhashPairs over the full corpus — asserted exactly here.
  */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streamed incremental near-dup equals one-shot batch pairs") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = DedupStream.neardupBatchDrain(spark, sfDir, nSplits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = Dedup.minhashPairs(
        Tables.load(spark, sfDir, "documents"), "text", "doc_id")
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty) // the corpus does contain near-dups
    assert(streamed === batch)
  }

  test("dropDuplicatesWithinWatermark halves a fully duplicated arrival") {
    val sfDir = "/root/testdata/sf0.001"
    val got = DedupStream.dedupWithinWatermarkDrain(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Tables.load(spark, sfDir, "events")
      .where(col("event_id") < 2000)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got === want) // survivors == batch DISTINCT, ids unique
  }
}
