package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Coreset

class CoresetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kcenter stops on sample exhaustion — no duplicate centers") {
    // 3 points on a 3-4-5 line: seed 0, farthest (6,8) at d=10, then
    // (3,4) equidistant (5) from both chosen centers; a 4th round has
    // no candidates left and must STOP, not re-emit a radius-0 center
    val sample = Seq(
      (0L, Seq(0.0, 0.0)), (5L, Seq(3.0, 4.0)), (9L, Seq(6.0, 8.0)))
      .toDF("id", "v")
    val r = Coreset.kcenter(sample, rounds = 8).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0, 0L, 0L), (1, 9L, 100000L), (2, 5L, 50000L)))
  }

  test("kcenter on an empty sample is a contract error, not head() crash") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Coreset.kcenter(empty, rounds = 3)
    }
    assert(e.getMessage.contains("non-empty sample"), e.getMessage)
  }

  test("kcenter radius trajectory is monotone nonincreasing") {
    val sample = (0L until 40L)
      .map(i => (i, Seq((i % 7).toDouble, (i % 11).toDouble)))
      .toDF("id", "v")
    val radii = Coreset.kcenter(sample, rounds = 8).collect()
      .sortBy(_.getInt(0)).map(_.getLong(2)).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a }, radii.toSeq)
  }
}
