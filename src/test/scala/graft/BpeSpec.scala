package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the classic Sennrich merge sequence") {
    // word frequencies: low:5 lower:2 newest:6 widest:3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
      ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val got = Bpe.learnMerges(docs, "text", iters = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    // iter1: "e s" and "s t" tie at 9, lexicographic tiebreak;
    // iter2: the new "es t" pair reaches 9; iter3: "l o" vs "o w"
    // tie at 7, lexicographic again
    assert(got === Seq(
      (1, "e s", "es", 9L),
      (2, "es t", "est", 9L),
      (3, "l o", "lo", 7L)))
  }

  test("greedy left-to-right merge on overlapping pairs") {
    // "aaa" has positional pairs (a,a)x2; after merging "a a" the
    // word must become [aa, a] (greedy non-overlapping), so the next
    // round counts pair "aa a", not "a aa"
    val docs = Seq(Seq.fill(4)("aaa").mkString(" ")).toDF("text")
    val got = Bpe.learnMerges(docs, "text", iters = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got(0) === ((1, "a a", "aa", 8L)))
    assert(got(1) === ((2, "aa a", "aaa", 4L)))
  }

  test("merge counts are non-increasing and merges contain no spaces") {
    val text = (Seq.fill(7)("spark") ++ Seq.fill(4)("sparse")
      ++ Seq.fill(5)("parquet")).mkString(" ")
    val got = Bpe.learnMerges(Seq(text).toDF("text"), "text", iters = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got.map(_._4) === got.map(_._4).sorted.reverse)
    assert(got.forall(m => !m._3.contains(" ")))
    assert(got.map(_._1) === (1 to got.length))
  }

  test("single-char-only vocabulary stops early with no merges") {
    val docs = Seq("a b c a b").toDF("text")
    assert(Bpe.learnMerges(docs, "text", iters = 3).count() === 0)
  }
}
