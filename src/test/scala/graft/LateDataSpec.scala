package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Pins the watermark late-drop semantics the `streaming_late_audit`
  * oracle replays: the watermark entering micro-batch b is
  * `max(eventTimeMs over batches < b) - delayMs`, and an arriving row
  * is dropped iff its window END is <= that watermark — including the
  * exact end-==-watermark boundary, exercised twice below.
  *
  * Scenario (1h tumbling windows, 2h delay, hour offsets):
  *   batch 0: 0.5h, 2.5h, 5.0h          -> wm after = 3.0h
  *   batch 1: 2.5h (end 3h == wm), 1.5h (end 2h < wm), 3.5h, 6h+1us
  *            -> wm after = 4.0h
  *   batch 2: 3.5h (end 4h == wm), 4.5h
  *   sentinel far ahead finalizes everything.
  */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val H = 3600L * 1000000L // one hour in micros

  private def evDf(rows: Seq[(Long, Long)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (id, us) => (id, us * 1000L, id, "a", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("watermark drops a row iff its window end <= the entering watermark") {
    val b0 = evDf(Seq((1L, H / 2), (2L, 5 * H / 2), (3L, 5 * H)))
    val b1 = evDf(Seq((4L, 5 * H / 2), (5L, 3 * H / 2), (6L, 7 * H / 2),
      (7L, 6 * H + 1)))
    val b2 = evDf(Seq((8L, 7 * H / 2), (9L, 9 * H / 2)))
    val out = EventStream
      .lateWindowCountsDrain(spark, Seq(b0, b1, b2), 1000L * H, "2 hours")
      .orderBy(col("hour_bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // [1,2): id5 (end 2h < wm 3h) dropped and the window never
    // materializes; [2,3): id4 (end 3h == wm 3h) dropped -> 1, not 2;
    // [3,4): id8 (end 4h == wm 4h) dropped -> 1, not 2. Everything
    // on time survives, and the sentinel finalizes all real windows
    // inside processAllAvailable (no-data batch).
    assert(out.toSeq === Seq(
      (0L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("on-time replay of the same batches loses nothing") {
    // same rows, arrival order = event-time order: no window end ever
    // trails the entering watermark, so every row lands
    val all = Seq((1L, H / 2), (5L, 3 * H / 2), (2L, 5 * H / 2),
      (4L, 5 * H / 2), (6L, 7 * H / 2), (8L, 7 * H / 2), (9L, 9 * H / 2),
      (3L, 5 * H), (7L, 6 * H + 1))
    val out = EventStream
      .lateWindowCountsDrain(spark, Seq(evDf(all)), 1000L * H, "2 hours")
      .orderBy(col("hour_bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("shared-ingest sweep matches a solo drain per delay") {
    // the sweep's concurrently-drained queries see the SAME one-file-
    // per-drain sequence, so each delay's output must be bit-equal to
    // lateWindowCountsDrain run alone with that delay — including the
    // 2h config whose boundary drops the first test pins
    val b0 = evDf(Seq((1L, H / 2), (2L, 5 * H / 2), (3L, 5 * H)))
    val b1 = evDf(Seq((4L, 5 * H / 2), (5L, 3 * H / 2), (6L, 7 * H / 2),
      (7L, 6 * H + 1)))
    val b2 = evDf(Seq((8L, 7 * H / 2), (9L, 9 * H / 2)))
    val delays = Seq("2 hours", "10 hours")
    val swept = EventStream.lateWindowCountsSweepDrain(
      spark, Seq(b0, b1, b2), 1000L * H, delays)
    delays.zip(swept).foreach { case (d, df) =>
      val got = df.orderBy(col("hour_bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      val solo = EventStream
        .lateWindowCountsDrain(spark, Seq(b0, b1, b2), 1000L * H, d)
        .orderBy(col("hour_bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(got === solo, s"delay $d")
    }
  }
}
