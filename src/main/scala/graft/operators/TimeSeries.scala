package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair over the event stream: regularize an hourly
  * per-key count series onto a dense grid and forward-fill the gaps —
  * the preprocessing step in front of any anomaly detector or
  * forecaster that assumes an evenly-spaced series (the reference
  * stops at raw event storage; this is the shaping a monitoring
  * pipeline does before it can z-score, cf. the `events_zscore`
  * query's ROWS frame which silently misbehaves on gapped hours).
  *
  * Scale shape: the only shuffle that touches raw events is the first
  * hash aggregate (map-side partial combine → |keys|×|hours| rows).
  * The dense grid is generated FROM the aggregate (per-key min/max
  * span + `sequence`/`explode`), so grid size is bounded by
  * |keys| × span-hours regardless of event volume, and the
  * forward-fill window runs over that small grid — never over events.
  * At 100 TB of events with ~1e3 keys × ~1e4 hours the post-agg
  * stages are ~1e7 rows: driver-free, broadcast-free, skew-free.
  */
object TimeSeries {

  /** Hourly count series per `keyCol`, densified to every hour in the
    * key's observed [min, max] span, with missing hours forward-filled
    * from the most recent observed hour: (key, hour_bucket, n,
    * is_gap). `ts` is long nanos (Tables.load). For any key within
    * the span cap, the first hour is observed by construction (the
    * span starts at an observed min), so `n` is never null after the
    * fill; a clamped key's leading unobserved hours keep null `n`.
    *
    * `maxSpanHours` bounds the generated grid per key: ONE corrupt
    * timestamp (a year-30000 epoch from a bad parser) would otherwise
    * make `sequence(lo, hi)` try to materialize a billions-element
    * array and kill the job. Keys are clamped to the most recent
    * `maxSpanHours` of their span (the default keeps >11 years, far
    * beyond any honest event stream); observed-but-clamped hours are
    * simply absent from the output, and the job survives.
    */
  def gapFillHourly(events: DataFrame, keyCol: String,
      maxSpanHours: Long = 100000L): DataFrame = {
    val hourly = events
      .select(col(keyCol), expr("ts div 1000000000 div 3600").as("hour_bucket"))
      .groupBy(col(keyCol), col("hour_bucket"))
      .agg(count(lit(1)).as("n_obs"))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min(col("hour_bucket")).as("lo"), max(col("hour_bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(
          greatest(col("lo"), col("hi") - lit(maxSpanHours - 1)),
          col("hi"))).as("hour_bucket"))
    val fill = Window.partitionBy(keyCol).orderBy("hour_bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq(keyCol, "hour_bucket"), "left")
      .select(col(keyCol), col("hour_bucket"),
        last(col("n_obs"), ignoreNulls = true).over(fill).as("n"),
        col("n_obs").isNull.as("is_gap"))
      .orderBy(col(keyCol), col("hour_bucket"))
  }

  /** Robust (median/MAD) anomaly detection over a per-key series —
    * the outlier-resistant alternative to the z-score (one genuine
    * spike inflates a stddev enough to mask a second spike; it moves
    * a median almost not at all). Flags points with
    * |x - median| > cut × MAD, where both medians are NEAREST-RANK
    * selections (rank (n+1) div 2 under a deterministic (value, time)
    * order) — selections of existing values, so the whole report is
    * bit-portable across engines, unlike interpolated quantiles.
    *
    * Input is an already-aggregated series (key, time, value) — at
    * 100 TB the only event-volume shuffle happened in that aggregate;
    * this runs |keys|×|points| windows, per-key local sorts.
    */
  def madAnomalies(series: DataFrame, keyCol: String, timeCol: String,
      valCol: String, cut: Double = 3.0): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val byVal = byKey.orderBy(col(valCol), col(timeCol))
    val withMed = series
      .withColumn("rn", row_number().over(byVal))
      .withColumn("nn", count(lit(1)).over(byKey))
      .withColumn("med",
        max(when(col("rn") === expr("(nn + 1) div 2"), col(valCol)))
          .over(byKey))
      .withColumn("dev", abs(col(valCol) - col("med")))
    val byDev = byKey.orderBy(col("dev"), col(timeCol))
    withMed
      .withColumn("rd", row_number().over(byDev))
      .withColumn("mad",
        max(when(col("rd") === expr("(nn + 1) div 2"), col("dev")))
          .over(byKey))
      .where(col("dev") > lit(cut) * col("mad"))
      .select(col(keyCol), col(timeCol), col(valCol), col("med"),
        round(col("dev"), 4).as("dev"), round(col("mad"), 4).as("mad"))
      .orderBy(col(keyCol), col(timeCol))
  }
}
