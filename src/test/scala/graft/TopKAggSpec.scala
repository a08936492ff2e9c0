package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAgg, TopKBuffer}
import graft.operators.Knn

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("TopKBuffer keeps k smallest with (dist,id) tie-break, any order") {
    val b1 = new TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (1.0, 1L), (9.0, 9L))
      .foreach { case (d, i) => b1.add(d, i) }
    assert(b1.sorted.toSeq == Seq((1.0, 1L), (1.0, 2L), (3.0, 3L)))
    // merge path (order-independent)
    val a = new TopKBuffer(3); val b = new TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 2L)).foreach { case (d, i) => a.add(d, i) }
    Seq((3.0, 3L), (1.0, 1L), (9.0, 9L)).foreach { case (d, i) => b.add(d, i) }
    a.merge(b)
    assert(a.sorted.toSeq == Seq((1.0, 1L), (1.0, 2L), (3.0, 3L)))
    // serde round-trip
    val c = TopKBuffer.deserialize(a.serialize())
    assert(c.sorted.toSeq == a.sorted.toSeq)
  }

  test("topk_pairs aggregate == rank window on real corpus") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaAgg = Knn.knnJoin(e, q, "vec_id", "embedding", "qid", "qvec",
      "euclidean", 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val viaWin = Knn.knnJoinWindow(e, q, "vec_id", "embedding", "qid", "qvec",
      "euclidean", 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("plan does partial aggregation before the exchange") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val plan = Knn.knnJoin(e, q, "vec_id", "embedding", "qid", "qvec",
      "euclidean", 3).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"), plan)
  }

  test("topk_pairs usable in plain groupBy aggregations") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.1, 11L), (1L, 0.3, 12L), (2L, 0.9, 13L))
      .toDF("g", "d", "i")
    val r = df.groupBy($"g")
      .agg(TopKAgg.topk_pairs($"d", $"i", 2).as("t"))
      .orderBy($"g").collect()
    val g1 = r(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(x => (x.getDouble(0), x.getLong(1))) == Seq((0.1, 11L), (0.3, 12L)))
    assert(r(1).getSeq[org.apache.spark.sql.Row](1).length == 1)
  }
}
