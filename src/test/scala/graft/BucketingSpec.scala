package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-rest layout half of SURVEY.md §5: big fact-fact joins
  * co-located via bucketing so the join needs no shuffle at all.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketBy(l_orderkey) join runs with no hash exchange") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_o_bkt")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bkt")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_o_bkt")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("graft_li_bkt")
        .join(spark.table("graft_o_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(j.count() > 0)
      // sanity: same result as the plain parquet join
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val bucketed = j.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(direct == bucketed)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_o_bkt")
    }
  }
}
