package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),        // tf(apple)=2, dl=3
    (2L, "apple cherry"),              // tf(apple)=1, dl=2
    (3L, "banana banana banana"),      // no apple
    (4L, "date elderberry fig grape")  // no query terms
  ).toDF("doc_id", "text")

  test("termStats counts tf, df and doc length") {
    val st = Bm25.termStats(corpus, "text", "doc_id", Seq("apple", "banana"))
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("dl"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(st == Seq(
      ("apple", 1L, 3, 2L, 2L),
      ("apple", 2L, 2, 1L, 2L),
      ("banana", 1L, 3, 1L, 2L),
      ("banana", 3L, 3, 3L, 2L)))
  }

  test("search ranks higher-tf docs first, skips no-term docs") {
    val r = Bm25.search(corpus, "text", "doc_id", "apple", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L)) // doc 1 has tf=2
    assert(r.forall(_._2 > 0))
  }

  test("rarer terms carry higher idf weight") {
    // "cherry" appears in 1 doc, "banana" in 2: a doc matching only
    // cherry must outscore a doc matching only banana at equal tf/dl
    val docs = Seq(
      (1L, "cherry x y"), (2L, "banana x y"), (3L, "banana z w")
    ).toDF("doc_id", "text")
    val r = Bm25.search(docs, "text", "doc_id", "cherry banana", 10)
      .collect().map(_.getLong(0))
    assert(r.head == 1L)
  }

  test("scores agree with a hand-computed BM25 value") {
    // doc 2: tf=1, dl=2, df=2, N=4, avgdl=(3+2+3+4)/4=3
    // idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    // denom = 1 + 1.2*(0.25 + 0.75*2/3) = 1.9
    // score = ln(2) * 1 * 2.2 / 1.9
    val expected = BigDecimal(math.log(2.0) * 2.2 / 1.9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Bm25.search(corpus, "text", "doc_id", "apple", 10)
      .where(col("doc_id") === 2L).head().getDouble(1)
    assert(r == expected, s"got $r want $expected")
  }

  test("final plan is a top-k heap, not a global sort") {
    val df = Bm25.search(corpus, "text", "doc_id", "apple banana", 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
