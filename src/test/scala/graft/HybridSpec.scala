package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hybrid

class HybridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rankTopC attaches dense 1..C ranks in order") {
    val df = Seq((1L, 0.5), (2L, 0.1), (3L, 0.9), (4L, 0.1))
      .toDF("id", "score")
    val got = Hybrid.rankTopC(df, Seq(col("score"), col("id")), 3, "rank")
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    // ties on score broken by id: 2 (0.1), 4 (0.1), 1 (0.5)
    assert(got == Seq((2L, 1), (4L, 2), (1L, 3)))
  }

  test("rrfFuse: shared docs sum both ranks, misses pay C+1") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "ra")
    val b = Seq((11L, 1), (12L, 2)).toDF("id", "rb")
    val got = Hybrid.rrfFuse(a, b, "id", "ra", "rb", c = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    def rrf(x: Int, y: Int) = BigDecimal(1.0 / (60 + x) + 1.0 / (60 + y))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(11L) == rrf(2, 1))  // in both lists
    assert(got(10L) == rrf(1, 3))  // missing from b -> rank c+1
    assert(got(12L) == rrf(3, 2))
    // doc in both lists outranks single-list docs at these ranks
    assert(got(11L) > got(10L) && got(11L) > got(12L))
  }

  test("minMaxFuse: normalizes per list, misses contribute 0, gaps survive") {
    // lex: runaway best (10.0 vs 1.0/0.0); vec: lower-is-better dists
    val lex = Seq((1L, 10.0), (2L, 1.0), (3L, 0.0)).toDF("id", "score")
    val vec = Seq((2L, 0.1), (3L, 0.5), (4L, 0.9)).toDF("id", "dist")
    val got = Hybrid.minMaxFuse(lex, vec, "id", wLex = 0.6, wVec = 0.4, topK = 4)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1.0, 0.0, 0.6)))        // lex best, absent in vec
    assert(got(2L) == ((0.1, 1.0, 0.46)))       // lex gap PRESERVED (0.1 not rank-2/3)
    assert(got(3L) == ((0.0, 0.5, 0.2)))
    assert(got(4L) == ((0.0, 0.0, 0.0)))        // vec worst, absent in lex
    // degenerate constant list normalizes to 1.0 everywhere
    val const = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "score")
    val g2 = Hybrid.minMaxFuse(const, vec, "id", 0.5, 0.5, topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(g2(1L) == 1.0 && g2(2L) == 1.0)
  }

  test("search_hybrid surfaces docs ranked well by either signal") {
    val out = SparkEntry.queries("search_hybrid")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 10)
    // every returned doc has at least one real (non-penalty) rank
    assert(out.forall(r => r.getInt(1) <= 100 || r.getInt(2) <= 100))
    // rrf strictly ordered descending with id tiebreak
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
