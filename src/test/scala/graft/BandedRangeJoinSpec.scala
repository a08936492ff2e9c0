package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandedRangeJoinRule

class BandedRangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def sides() = {
    val o = Tables.load(spark, sf, "orders")
    (o.select(col("o_orderkey").as("k"), col("o_totalprice").as("p")),
      o.select(col("o_orderkey").as("k2"), col("o_totalprice").as("p2")))
  }

  test("natural range join is rewritten to a bucketed equi join") {
    val (a, b) = sides()
    val j = a.join(b, col("k") < col("k2") && col("k2") - col("k") <= lit(10L))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_bkt"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("rewrite preserves results exactly") {
    val (a, b) = sides()
    def run() = a
      .join(b, col("k") < col("k2") && col("k2") - col("k") <= lit(10L))
      .select(col("k"), col("k2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val withRule = run()
    spark.conf.set("spark.sql.optimizer.excludedRules", BandedRangeJoinRule.ruleName)
    try {
      val without = run()
      assert(withRule == without && withRule.nonEmpty)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("joins that already have an equi key are left alone") {
    val (a, b) = sides()
    val j = a.join(b, col("k") === col("k2") && col("k2") - col("k") <= lit(10L))
    assert(!j.queryExecution.executedPlan.toString.contains("_graft_bkt"))
  }
}
