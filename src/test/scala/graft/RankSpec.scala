package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rank

/** Differential spec: Rank.globalNtile must be bit-identical to
  * Spark's own `ntile(k) OVER (ORDER BY ...)` (which is itself
  * oracle-matched against DuckDB's ntile elsewhere) — across bucket
  * counts, duplicate order values (tiebreak decides), and n < k.
  */
class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(n: Int, k: Int): Unit = {
    // deterministic data with heavy value ties: v = i*37 % 11
    val df = (1 to n).map(i => (i.toLong, (i * 37 % 11).toLong))
      .toDF("id", "v")
    val expected = df
      .withColumn("tile", ntile(k).over(Window.orderBy(col("v"), col("id"))))
      .select("id", "tile").as[(Long, Int)].collect().toMap
    val got = Rank.globalNtile(df, k, "tile", col("v"), col("id"))
      .select("id", "tile").as[(Long, Int)].collect().toMap
    assert(got === expected, s"n=$n k=$k")
  }

  test("matches Window ntile across shapes") {
    for ((n, k) <- Seq((100, 3), (100, 10), (97, 4), (11, 11), (30, 7)))
      check(n, k)
  }

  test("n < k: one row per tile, like SQL ntile") { check(5, 10) }

  test("exact divisibility: equal buckets") { check(90, 9) }

  test("globalCumSum matches the global running-sum window") {
    // heavy ties + negatives (the descending-Pareto usage negates)
    val df = (1 to 200)
      .map(i => (i.toLong, (i * 37 % 13).toLong - 6))
      .toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val got = Rank.globalCumSum(df, "v", "cum", "tot", col("v"), col("id"))
    val gotMap = got.select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotMap === expected)
    val tots = got.select("tot").as[Long].collect().toSet
    assert(tots === Set(df.agg(sum(col("v"))).as[Long].head))
  }
}
