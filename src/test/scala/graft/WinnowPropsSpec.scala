package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels
import graft.operators.Corpus
import org.apache.spark.unsafe.types.UTF8String

/** Randomized (seeded) property check of the winnow selection against
  * a brute-force in-memory reference model: for arbitrary token
  * sequences, the distributed single-window-pass form (min over
  * struct(h, -pos)) must select exactly the set of (hash, pos) pairs
  * that enumerating every window and taking its rightmost minimum
  * selects.
  */
class WinnowPropsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 4
  private val K = 3

  /** Brute force: every window of W consecutive shingle hashes picks
    * (min value, max position among minima); distinct pairs.
    */
  private def model(text: String): Set[(Long, Int)] = {
    val hs = TextKernels.shingleHashes(UTF8String.fromString(text), K)
    (0 to hs.length - W).map { s =>
      val win = (s until s + W).map(p => (hs(p), p))
      val m = win.map(_._1).min
      (m, win.filter(_._1 == m).map(_._2).max)
    }.toSet
  }

  test("winnowFingerprints == brute-force window enumeration on random docs") {
    val rnd = new Random(7)
    // small vocab forces heavy hash ties (the rightmost-tie rule is
    // the part most likely to diverge); vary lengths across the
    // no-window / exact-one-window / many-window regimes
    val docs = (0 until 24).map { i =>
      val n = 1 + rnd.nextInt(30)
      val vocabBits = 1 + rnd.nextInt(3) // 2, 4, or 8 distinct tokens
      val text = (0 until n)
        .map(_ => s"t${rnd.nextInt(1 << vocabBits)}").mkString(" ")
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.winnowFingerprints(df, "text", "doc_id", K, W)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    docs.foreach { case (id, text) =>
      val want = model(text)
      val have = got.getOrElse(id, Set.empty)
      assert(have == want, s"doc $id: text='$text'")
    }
  }
}
