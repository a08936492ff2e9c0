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

  /** FLOOR hour bucket of the ns `ts` column — remainder-subtracting
    * exact integer division (the [[holtBacktest]] fdiv pattern):
    * Spark's `div` truncates toward zero while the DuckDB oracles
    * floor (`floor(epoch(ts)/3600)`), and the two disagree exactly on
    * pre-1970 (negative) timestamps. Identical for ts >= 0.
    */
  private val hourBucketExpr: String = {
    val d = "3600000000000L" // ns per hour
    s"(ts - (((ts % $d) + $d) % $d)) div $d"
  }

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
      .select(col(keyCol), expr(hourBucketExpr).as("hour_bucket"))
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

  /** ZERO-filled hourly count series per key on the dense [lo, hi]
    * hour grid (a missing hour means zero events — the series shape
    * [[acf]] and [[holtBacktest]] share; [[gapFillHourly]] is the
    * forward-filled variant): (key, h, n). Same `maxSpanHours`
    * corrupt-timestamp cap as the forward-fill grid.
    */
  private def zeroFilledHourly(events: DataFrame, keyCol: String,
      maxSpanHours: Long): DataFrame = {
    val hourly = events
      .select(col(keyCol), expr(hourBucketExpr).as("h"))
      .groupBy(col(keyCol), col("h"))
      .agg(count(lit(1)).as("n_obs"))
    hourly.groupBy(col(keyCol))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col(keyCol),
        explode(sequence(
          greatest(col("lo"), col("hi") - lit(maxSpanHours - 1)),
          col("hi"))).as("h"))
      .join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"), coalesce(col("n_obs"), lit(0L)).as("n"))
  }

  /** Sample autocorrelation of the hourly count series per key at the
    * given lags — the seasonality/persistence readout a forecaster
    * reads before choosing its model order (a daily-periodic stream
    * shows a positive spike at lag 24; white noise hovers at 0). The
    * series is ZERO-filled onto the dense per-key hour grid (a
    * missing hour means zero events; forward-filling would overstate
    * persistence, which is exactly what an ACF measures), then each
    * lag L pairs hour t with hour t+L and the Pearson correlation is
    * computed from exact integer moments: counts and all six sums
    * live in DECIMAL(38,0) (the price_qty_regression overflow-proof
    * budget), and the only float arithmetic is the final
    * cast → sqrt → divide, identically ordered in the DuckDB replay,
    * shipped as fixed-point `acf_e6` (signed-zero-free BIGINT).
    * Constant-series keys (zero variance on either side) are dropped
    * rather than shipped as NaN.
    *
    * Scale shape: raw events shuffle ONCE (the hourly hash aggregate,
    * map-side combined); the dense grid is |keys| × span-hours rows
    * generated from the aggregate (`maxSpanHours` caps a corrupt
    * timestamp exactly as in [[gapFillHourly]]); all lags ride ONE
    * explode + equi-join of the grid against itself on
    * (key, hour+lag); everything after the moment aggregate is
    * |keys| × |lags| rows. Nothing event-volume-sized survives the
    * first stage.
    */
  def acf(events: DataFrame, keyCol: String, lags: Seq[Int],
      maxSpanHours: Long = 100000L): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1) &&
      lags.distinct.length == lags.length,
      s"acf needs distinct positive lags, got $lags")
    val series = zeroFilledHourly(events, keyCol, maxSpanHours)
      .select(col(keyCol), col("h"), col("n").cast("decimal(38,0)").as("n"))
    val pairs = series
      .select(col(keyCol), explode(lit(lags.toArray)).as("lag"),
        (col("h") + col("lag")).as("h"), col("n").as("x"))
      .join(series.select(col(keyCol), col("h"), col("n").as("y")),
        Seq(keyCol, "h"))
    val m = pairs.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("np"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    m.select(col(keyCol), col("lag").cast("bigint").as("lag"),
        col("np").cast("bigint").as("n_pairs"),
        (col("np") * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("num"),
        (col("np") * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("dx"),
        (col("np") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("dy"))
      .where(col("dx") > 0 && col("dy") > 0)
      .select(col(keyCol), col("lag"), col("n_pairs"),
        round(col("num") / (sqrt(col("dx")) * sqrt(col("dy"))) * 1e6)
          .cast("bigint").as("acf_e6"))
      .orderBy(col(keyCol), col("lag"))
  }

  /** Holt linear-trend (double exponential smoothing) backtest per
    * key over the zero-filled hourly count series — the level+trend
    * forecaster next to the seasonal-naive baseline
    * `events_forecast_backtest` ships (Holt 1957; Hyndman &
    * Athanasopoulos, "Forecasting: Principles and Practice" §8.2).
    * The last `holdout` hours are held out, the recurrences
    *
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * run over the training prefix ENTIRELY in 1e6 fixed point with
    * rational α = alphaNum/denom, β = betaNum/denom and an explicit
    * remainder-subtracting floor division (Spark's `div` truncates
    * toward zero and DuckDB's `//` floors — they disagree exactly
    * when a trend turns negative, so the recurrence subtracts the
    * portable pmod remainder first and divides exactly). The h-step
    * forecast l + h·b is scored against the holdout next to the
    * seasonal-naive (t − seasonLag) prediction — both as exact
    * integer sums of absolute e6 errors.
    *
    * Scale shape: Holt is inherently SEQUENTIAL per series, so the
    * honest distributed form is one array fold per key (`aggregate`
    * over the collected hour array, bounded by the same
    * `maxSpanHours` cap as [[gapFillHourly]] — ≤1e5 elements per
    * key): parallel across keys, map-side after the one
    * event-volume shuffle into the hourly aggregate. No window, no
    * iteration shuffles — the fold happens inside one projection.
    */
  def holtBacktest(events: DataFrame, keyCol: String, holdout: Int = 24,
      seasonLag: Int = 168, alphaNum: Int = 2, betaNum: Int = 1,
      denom: Int = 10, maxSpanHours: Long = 100000L): DataFrame = {
    require(holdout >= 1 && seasonLag >= 1 && denom >= 2 &&
      alphaNum >= 1 && alphaNum < denom && betaNum >= 1 && betaNum < denom,
      s"bad holt config: holdout=$holdout lag=$seasonLag " +
        s"alpha=$alphaNum/$denom beta=$betaNum/$denom")
    val series = zeroFilledHourly(events, keyCol, maxSpanHours)
    val arr = series.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("h"), col("n")))).as("sn"))
      .select(col(keyCol),
        expr("transform(sn, x -> x.n * 1000000L)").as("v"))
      .where(size(col("v")) >= lit(holdout * 2))
      .withColumn("nt", size(col("v")) - lit(holdout))
    def fdiv(a: String): String =
      s"(($a) - (((($a) % $denom) + $denom) % $denom)) div $denom"
    val nl = fdiv(s"$alphaNum * x + ${denom - alphaNum} * (acc.l + acc.b)")
    val nb = fdiv(s"$betaNum * (($nl) - acc.l) + ${denom - betaNum} * acc.b")
    arr
      .withColumn("st", expr(
        s"""aggregate(slice(v, 2, nt - 1),
           |  named_struct('l', element_at(v, 1), 'b', 0L),
           |  (acc, x) -> named_struct('l', $nl, 'b', $nb))"""
          .stripMargin.replaceAll("\n", " ")))
      .select(col(keyCol), size(col("v")).cast("long").as("n_hours"),
        col("st.l").as("level_e6"), col("st.b").as("trend_e6"),
        expr(s"""aggregate(sequence(1, $holdout), 0L, (acc, h) ->
             |  acc + abs(element_at(v, nt + h) - (st.l + h * st.b)))"""
          .stripMargin.replaceAll("\n", " ")).as("sae_holt_e6"),
        expr(s"""aggregate(sequence(1, $holdout), 0L, (acc, h) ->
             |  acc + abs(element_at(v, nt + h) - IF(nt + h > $seasonLag,
             |    element_at(v, nt + h - $seasonLag), 0L)))"""
          .stripMargin.replaceAll("\n", " ")).as("sae_naive_e6"))
      .orderBy(col(keyCol))
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
