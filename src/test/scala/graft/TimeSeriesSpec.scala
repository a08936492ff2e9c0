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
}
