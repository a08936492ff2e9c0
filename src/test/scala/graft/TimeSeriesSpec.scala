package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour of nanos

  test("gapFillHourly: dense grid, forward-filled gaps, flagged") {
    // key "a": events in hours 10, 13 (gap at 11, 12); key "b": hour 5 only
    val events = Seq(
      ("a", 10 * H), ("a", 10 * H + 1), ("a", 13 * H),
      ("b", 5 * H)).toDF("k", "ts")
    val out = TimeSeries.gapFillHourly(events, "k")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      ("a", 10L, 2L, false), // observed: 2 events
      ("a", 11L, 2L, true),  // gap, carries hour 10's count
      ("a", 12L, 2L, true),
      ("a", 13L, 1L, false),
      ("b", 5L, 1L, false))) // single-hour span: no gaps
  }

  test("gapFillHourly: n is never null (span starts at an observed hour)") {
    val events = Seq(("a", 0L), ("a", 2 * H)).toDF("k", "ts")
    val out = TimeSeries.gapFillHourly(events, "k")
    assert(out.where(col("n").isNull).count() === 0)
    assert(out.count() === 3)
  }

  test("gapFillHourly: one corrupt timestamp cannot explode the grid") {
    // hour 10 plus a far-future outlier (a year-2198 epoch — the
    // largest hour that still fits in long nanos): without the span
    // cap, sequence(10, 2e6) materializes a two-million-element array
    // per such key; a worse parser bug kills the job outright
    val corrupt = 2_000_000L
    val events = Seq(
      ("a", 10 * H), ("a", corrupt * H),
      ("b", 10 * H), ("b", 11 * H)).toDF("k", "ts")
    val out = TimeSeries.gapFillHourly(events, "k", maxSpanHours = 1000L)
      .collect()
    // key a is clamped to the most recent 1000 hours of its span;
    // key b (honest 2-hour span) is untouched
    assert(out.count(_.getString(0) == "a") === 1000)
    assert(out.count(_.getString(0) == "b") === 2)
    // the clamped key's surviving observed hour is the outlier itself
    val aObs = out.filter(r => r.getString(0) == "a" && !r.getBoolean(3))
    assert(aObs.map(_.getLong(1)).toSeq === Seq(corrupt))
  }

  test("madAnomalies: median/MAD flags the spike a z-score masks") {
    // series: nine 10.0s, one 200.0 (hour 9) and one 60.0 (hour 10).
    // med = 10, deviations = eight 0s + 190 + 50 -> MAD = 0 lower-
    // median... use a wigglier base so MAD > 0:
    // values 8,9,10,11,12 repeated twice + spikes 200, 60
    val base = (0 until 10).map(i => ("a", i.toLong, (8 + i % 5).toDouble))
    val rows = base :+ (("a", 10L, 200.0)) :+ (("a", 11L, 60.0))
    val df = rows.toDF("k", "h", "v")
    val out = TimeSeries.madAnomalies(df, "k", "h", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // n=12: sorted values 8,8,9,9,10,10,11,11,12,12,60,200 ->
    // med = rank 6 = 10; devs 0,0,1,1,2,2,1,1,2,2,50,190 sorted
    // 0,0,1,1,1,1,2,2,2,2,50,190 -> mad = rank 6 = 1
    // flags: dev > 3 -> the two spikes only
    assert(out.toSeq == Seq((10L, 200.0), (11L, 60.0)))
    // a z-score would mask the 60: mean~28.3, sd~54 -> z(60) < 1
  }

  test("madAnomalies: constant series (MAD 0) flags any deviation, nothing else") {
    val df = ((0 until 6).map(i => ("a", i.toLong, 5.0)) :+ (("a", 6L, 5.5)))
      .toDF("k", "h", "v")
    val out = TimeSeries.madAnomalies(df, "k", "h", "v").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(6L))
  }

  test("madAnomalies matches a brute-force model on random series") {
    val rnd = new scala.util.Random(11)
    def lowerMedian(xs: Seq[Double]): Double =
      xs.sorted.apply((xs.size - 1) / 2)
    (1 to 8).foreach { _ =>
      val rows = (0 until 2).flatMap { k =>
        val n = 3 + rnd.nextInt(15)
        (0 until n).map(h =>
          (s"k$k", h.toLong, (rnd.nextInt(2000) / 100.0)))
      }
      // NOTE: flatMap directly on the groupBy Map would rebuild a Map
      // from the (k, h) tuples and silently keep ONE flag per key
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, xs) =>
        val med = lowerMedian(xs.map(_._3))
        val mad = lowerMedian(xs.map(x => math.abs(x._3 - med)))
        xs.filter(x => math.abs(x._3 - med) > 3 * mad)
          .map(x => (k, x._2))
      }.toSet
      val got = TimeSeries.madAnomalies(rows.toDF("k", "h", "v"), "k", "h", "v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"rows=$rows")
    }
  }

  test("acf: alternating series reads -1 at lag 1, +1 at lag 2") {
    // counts 2,1,2,1,... over 12 hours: perfectly anti-correlated one
    // hour apart, perfectly correlated two apart (the e6 fixed point
    // is exact: every pair set is again a balanced 2/1 alternation)
    val events = (0 until 12).flatMap { h =>
      (0 until (if (h % 2 == 0) 2 else 1)).map(i => ("a", h * H + i))
    }.toDF("event_type", "ts")
    val out = TimeSeries.acf(events, "event_type", Seq(1, 2))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (11L, -1000000L))
    assert(out(2L) == (10L, 1000000L))
  }

  test("acf: zero-fills gaps (a missing hour is zero events, not a carry)") {
    // key with events only at even hours 0,2,4,6: the dense grid puts
    // a true 0 at odd hours -> strong NEGATIVE lag-1 autocorrelation.
    // A forward-filled series would be constant (undefined r, dropped)
    val events = Seq(("a", 0L), ("a", 2 * H), ("a", 4 * H), ("a", 6 * H))
      .toDF("event_type", "ts")
    val out = TimeSeries.acf(events, "event_type", Seq(1))
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == -1000000L) // exact alternation again
  }

  test("acf: brute-force Pearson agreement on a random series") {
    val rnd = new scala.util.Random(7)
    val counts = (0 until 40).map(_ => rnd.nextInt(5))
    val events = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("k", h * H + i))
    }.toDF("event_type", "ts")
    def pearson(xs: Seq[Int], ys: Seq[Int]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
      val sxx = xs.map(a => a.toDouble * a).sum
      val syy = ys.map(a => a.toDouble * a).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val out = TimeSeries.acf(events, "event_type", Seq(1, 3, 5))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    Seq(1, 3, 5).foreach { lag =>
      // the grid spans first..last OBSERVED hour; leading/trailing
      // all-zero hours are outside it
      val lo = counts.indexWhere(_ > 0)
      val hi = counts.lastIndexWhere(_ > 0)
      val series = counts.slice(lo, hi + 1)
      val want = pearson(series.dropRight(lag), series.drop(lag))
      assert(math.abs(out(lag.toLong) / 1e6 - want) < 2e-6,
        s"lag=$lag got=${out(lag.toLong)} want=$want")
    }
  }

  test("acf: constant series is dropped, not NaN") {
    val events = (0 until 6).map(h => ("a", h * H)).toDF("event_type", "ts")
    assert(TimeSeries.acf(events, "event_type", Seq(1)).count() == 0)
  }

  test("holtBacktest matches a brute-force integer model") {
    // 60 hours of a ramp with a mod-3 bump: first/last hours observed
    // (so the grid is exactly hours 0..59), interior zeros exercised
    val counts = (0 until 60).map(h => h / 4 + (if (h % 3 == 0) 1 else 0))
    val events = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("a", h * H + i))
    }.toDF("event_type", "ts")
    val v = counts.map(_ * 1000000L)
    val nt = 60 - 24
    var l = v(0); var b = 0L
    (1 until nt).foreach { t =>
      val nl = Math.floorDiv(2 * v(t) + 8 * (l + b), 10)
      b = Math.floorDiv((nl - l) + 9 * b, 10)
      l = nl
    }
    val saeHolt = (1 to 24).map(h => math.abs(v(nt + h - 1) - (l + h * b))).sum
    val saeNaive = (1 to 24).map(h => v(nt + h - 1)).sum // lag 168 > span
    val row = TimeSeries.holtBacktest(events, "event_type").collect()
    assert(row.length == 1)
    val r = row.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((60L, l, b, saeHolt, saeNaive)))
  }

  test("holtBacktest: negative trend survives the portable floor division") {
    // strictly decreasing counts force b < 0 — the exact case where
    // Spark's div (toward zero) and a naive // (floor) disagree
    val counts = (0 until 60).map(h => 60 - h)
    val events = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("a", h * H + i))
    }.toDF("event_type", "ts")
    val out = TimeSeries.holtBacktest(events, "event_type").collect().head
    assert(out.getLong(3) < 0L, s"trend_e6=${out.getLong(3)}")
    // a fitted downward trend must beat the zero-pred naive here
    assert(out.getLong(4) < out.getLong(5))
  }
}
