package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HeavyHitters, TextFuncs}

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("capacity >= distinct items degenerates to exact counts, err 0") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("item")
    val got = df.agg(HeavyHitters.heavy_hitters(col("item"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("space-saving guarantees hold vs exact counts on the token stream") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val toks = docs.select(explode(TextFuncs.tokens(col("text"))).as("t"))
      .repartition(8) // force the distributed partial-agg + merge path
    val exact = toks.groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val m = 64
    val sketch = toks.agg(HeavyHitters.heavy_hitters(col("t"), m).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val kept = sketch.map(_._1).toSet
    assert(sketch.length <= m)
    // every item with true count > N/m is present
    val mustKeep = exact.filter { case (_, c) => c > n / m }.keySet
    assert(mustKeep.subsetOf(kept), s"missing: ${mustKeep -- kept}")
    // estimates never undercount, and overcount by at most err
    sketch.foreach { case (it, est, err) =>
      val ex = exact.getOrElse(it, 0L)
      assert(est >= ex, s"$it est=$est < exact=$ex")
      assert(est - err <= ex, s"$it est-err=${est - err} > exact=$ex")
    }
  }

  test("tokens_hh_exact regime: distinct tokens <= m=128 at every SF") {
    // the driver query's oracle (plain GROUP BY with err=0) is only
    // equal to the sketch when capacity covers the whole domain; this
    // pins that assumption on the actual test corpora so a testdata
    // regeneration that widens the vocabulary fails HERE, not as an
    // opaque hash mismatch in the gate
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val d = Tables.load(spark, dir, "documents")
        val distinct = d.select(explode(TextFuncs.tokens(col("text"))).as("t"))
          .agg(countDistinct(col("t"))).head().getLong(0)
        assert(distinct <= 128, s"$sf: $distinct distinct tokens > m=128")
      }
    }
  }

  test("SQL heavy_hitters registration validates m") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    d.createOrReplaceTempView("hh_docs")
    // valid literal m works through SQL
    val ok = spark.sql(
      "SELECT heavy_hitters(source, 4) AS hh FROM hh_docs").head()
    assert(ok.getSeq[Any](0).nonEmpty)
    // m = 0 and non-literal m are rejected with a clear message
    val e1 = intercept[Exception] {
      spark.sql("SELECT heavy_hitters(source, 0) FROM hh_docs").head()
    }
    assert(e1.getMessage.contains("m must be >= 1"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT heavy_hitters(source, n_chars) FROM hh_docs").head()
    }
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
  }

  test("plan shape: partial heavy_hitters before the exchange") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(explode(TextFuncs.tokens(col("text"))).as("t"))
    val plan = toks.agg(HeavyHitters.heavy_hitters(col("t"), 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_heavy_hitters"), plan)
  }
}
