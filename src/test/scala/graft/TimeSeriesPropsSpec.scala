package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Randomized (seeded) property check of gapFillHourly against a
  * straightforward in-memory reference model: for arbitrary sparse
  * (key, hour) multisets, the output must be a dense per-key grid over
  * the observed [min, max] span whose non-gap rows carry the observed
  * count and whose gap rows carry the most recent observed count.
  */
class TimeSeriesPropsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val H = 3600L * 1000000000L

  test("gapFillHourly matches the reference model on random inputs") {
    val rnd = new Random(42)
    (1 to 12).foreach { _ =>
      val nKeys = 1 + rnd.nextInt(3)
      val events = (0 until nKeys).flatMap { k =>
        val base = rnd.nextInt(50).toLong
        val nEv = 1 + rnd.nextInt(12)
        (0 until nEv).map { _ =>
          val hour = base + rnd.nextInt(10)
          (s"k$k", hour * H + rnd.nextInt(3600).toLong * 1000000000L)
        }
      }
      // reference model
      val counts = events.groupBy { case (k, ts) => (k, ts / H) }
        .map { case (kh, es) => kh -> es.size.toLong }
      val expected = counts.keys.groupBy(_._1).toSeq.flatMap {
        case (k, khs) =>
          val hours = khs.map(_._2)
          val (lo, hi) = (hours.min, hours.max)
          var lastN = 0L
          (lo to hi).map { h =>
            val obs = counts.get((k, h))
            lastN = obs.getOrElse(lastN)
            (k, h, lastN, obs.isEmpty)
          }
      }.sortBy(r => (r._1, r._2))

      val spark2 = spark
      import spark2.implicits._
      val got = TimeSeries.gapFillHourly(events.toDF("k", "ts"), "k")
        .as[(String, Long, Long, Boolean)].collect().toSeq
      assert(got === expected, s"events=$events")
    }
  }
}
