package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling over the event stream: OHLC bars and interval
  * coverage — the two classic "continuous signal from discrete events"
  * reductions the reference's event-analytics pipeline
  * (`/root/reference/src/glue/b3_collector.py` daily aggregation loop)
  * implies but computes only in its single-key daily form.
  *
  * Both operators are single-exchange designs: the bar aggregation
  * shuffles once on (bar, series) and the coverage plan shuffles once on
  * the user key, with every window and re-aggregation riding that same
  * partitioning. All arithmetic is integer microseconds / integer cents,
  * so results are engine-exact under the DuckDB hash gate.
  */
object TimeSeries {

  /** OHLC (open/high/low/close) resampling: tumbling `barUs` bars per
    * event_type over the `value` signal, in integer cents.
    *
    * Open/close are `min_by`/`max_by` with a (us, event_id) struct
    * ordering — a single hash aggregate, NOT a sort + first/last window:
    * partial min_by/max_by combine map-side, so the only exchange moves
    * one partially-reduced row per (bar, series) per task, and a bar's
    * full event list is never co-resident. The event_id tiebreak makes
    * the ordering total, so open/close are deterministic even when two
    * trades share a microsecond.
    *
    * Scale shape: cardinality of the output ∝ bars × series — bounded
    * and tiny relative to input; the aggregation is the map-side-combine
    * pattern that survives any input volume. No window function touches
    * the raw stream.
    */
  def ohlcBars(events: DataFrame, barUs: Long = 3600000000L): DataFrame = {
    val e = events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(
        col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("bar_us", expr(s"(us div ${barUs}L) * ${barUs}L"))
    e.groupBy("bar_us", "event_type")
      .agg(
        min_by(col("cents"), struct(col("us"), col("event_id"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), struct(col("us"), col("event_id"))).as("close_cents"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("vol_cents"))
      .orderBy("bar_us", "event_type")
  }

  /** Interval union ("gaps and islands" over real intervals): each event
    * opens a `holdUs`-long activity interval; per user, overlapping or
    * touching intervals merge into islands, reported as island count,
    * total covered time, and the longest island.
    *
    * The merge is the running-max-of-end technique: ordered by (us,
    * event_id) within the user, an interval starts a new island iff its
    * start lies strictly past the max end seen so far (boundary-touching
    * intervals merge). Island ids are a running sum of that flag. Both
    * windows and both downstream aggregations share the `user_id`
    * partitioning — Catalyst plans ONE Exchange for the whole query
    * (pinned in TimeSeriesSpec).
    *
    * Scale: the island flag is O(1) state per row (running max + running
    * sum), never a buffered frame; skew bound is the hottest user, same
    * argument as [[Sessions.sessionize]]. Fixed-length intervals mean
    * sorting by start also sorts by end, which is what makes the
    * running-max proof exact.
    */
  def intervalCoverage(events: DataFrame, holdUs: Long = 1800000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val islands = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("end_us", col("us") + lit(holdUs))
      .withColumn("prev_end", max(col("end_us")).over(
        byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("us") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min(col("us")).as("start_us"), max(col("end_us")).as("fin_us"),
        count(lit(1)).as("n"))
    islands
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("fin_us") - col("start_us")).as("covered_us"),
        max(col("fin_us") - col("start_us")).as("longest_us"),
        sum(col("n")).as("n_events"))
      .orderBy("user_id")
  }

  /** Per-series least-squares TREND as an exact integer rational: for
    * each user, the OLS slope of value-cents against minutes-since-the-
    * series-start, emitted as (numerator, denominator) BIGINTs —
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * plus the intercept numerator over the same denominator. The FP
    * division is left to the CONSUMER, where engine-specific rounding
    * lives; everything the engine computes is integer arithmetic, so the
    * result is hash-exact across engines (same design as the correlation
    * sufficient statistics).
    *
    * x is the MINUTE offset from the series' own first event — slope is
    * translation-invariant in x, and the group-relative origin keeps
    * every product far inside BIGINT (x ≤ minutes-of-retention, not
    * epoch minutes whose squares approach 2⁶³). The per-series min rides
    * a window over the same user_id partitioning the aggregation
    * shuffles on: ONE exchange end-to-end.
    *
    * Series with a degenerate design matrix (all events in one minute →
    * denominator 0) are reported with n but null slope terms rather than
    * dropped — "no trend measurable" is an answer, not a missing row.
    */
  def trendSlopes(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val stats = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("min_us", min(col("us")).over(byUser))
      // SQL `div` (integer division), NOT `/` (double division): the
      // offset stays in exact integer arithmetic end-to-end
      .withColumn("x", expr("(us - min_us) div 60000000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("cents")).as("sxy"))
    stats
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("user_id"), col("n"),
        when(col("den") > 0, col("n") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        when(col("den") > 0, col("den")).as("slope_den"),
        when(col("den") > 0, col("sy") * col("sxx") - col("sx") * col("sxy"))
          .as("intercept_num"))
      .orderBy("user_id")
  }

  /** MAXIMUM DRAWDOWN per series (the B3 risk classic): the largest
    * peak-to-trough fall of the cents signal in (us, event_id) order —
    * running max over the ordered stream, drawdown = peak − value, one
    * max per series, plus the EARLIEST trough time achieving it (an
    * aggregated argmax re-derived by an equi-join on the per-series max,
    * which is deterministic where a bare max_by over ties is not).
    *
    * Shape: the running-max window and both aggregations all ride ONE
    * event_type hash partitioning; the argmax join touches only the
    * |series|-row aggregate against the windowed stream — no second
    * global pass.
    */
  def maxDrawdown(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("peak", max(col("cents")).over(w))
      .withColumn("dd", col("peak") - col("cents"))
    val agg = dd.groupBy("event_type")
      .agg(max(col("dd")).as("max_drawdown_cents"),
        max(col("peak")).as("peak_cents"),
        count(lit(1)).as("n_events"))
    agg.join(dd.select(col("event_type"), col("dd"), col("us")),
        Seq("event_type"))
      .filter(col("dd") === col("max_drawdown_cents"))
      .groupBy("event_type")
      .agg(max(col("max_drawdown_cents")).as("max_drawdown_cents"),
        max(col("peak_cents")).as("peak_cents"),
        max(col("n_events")).as("n_events"),
        min(col("us")).as("trough_us"))
      .orderBy("event_type")
  }

  /** RSI over hourly close bars, in integer PERMILLE (Cutler's simple-
    * average form): per series, close deltas between consecutive bars
    * split into gains and losses, summed over a trailing `period`-bar
    * frame, rsi = 1000·G div (G+L) — floor integer division, so the
    * indicator is engine-exact (Wilder's exponential smoothing would
    * drag FP across the whole history; the simple form is the one a
    * hash gate can pin). Bars inside the warm-up (fewer than `period`
    * deltas) and flat windows (G+L = 0) report null.
    *
    * Shape: one hash aggregate to bars (map-side-combining min_by/
    * max_by), then lag + two frame sums over the SAME (series, bar)
    * ordering — a single exchange on event_type, windows over ≤ bars
    * rows, never the raw stream.
    */
  def rsiBars(events: DataFrame, period: Int = 14,
      barUs: Long = 3600000000L): DataFrame = {
    require(period >= 2, "RSI needs at least two deltas")
    val byType = Window.partitionBy("event_type").orderBy("bar_us")
    val frame = byType.rowsBetween(-(period - 1), Window.currentRow)
    ohlcBars(events, barUs)
      .select(col("event_type"), col("bar_us"), col("close_cents"))
      .withColumn("delta",
        col("close_cents") - lag(col("close_cents"), 1).over(byType))
      .withColumn("gain", greatest(col("delta"), lit(0L)))
      .withColumn("loss", greatest(-col("delta"), lit(0L)))
      .withColumn("n_deltas",
        count(col("delta")).over(frame))
      .withColumn("gsum", sum(col("gain")).over(frame))
      .withColumn("lsum", sum(col("loss")).over(frame))
      .select(col("event_type"), col("bar_us"), col("close_cents"),
        when(col("n_deltas") >= period && col("gsum") + col("lsum") > 0,
          expr("gsum * 1000 div (gsum + lsum)")).as("rsi_permille"))
      .orderBy("event_type", "bar_us")
  }

  /** BULLISH-ENGULFING candlestick scan (e27): consecutive-bar pattern
    * predicates over the hourly OHLC stream — a down bar (close < open)
    * whose successor's body strictly engulfs it upward (open ≤ previous
    * close, close ≥ previous open, close > open). The SQL-native
    * MATCH_RECOGNIZE-lite: a fixed-length sequence pattern is one lag
    * window + a row predicate, no state machine needed — integer-cents
    * comparisons end to end, so the matches are engine-exact.
    *
    * Shape: bars are a map-side-combining aggregate (∝ bars, not
    * events); the lag and the scan ride one (series) partitioning.
    */
  def engulfingBars(events: DataFrame, barUs: Long = 3600000000L): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("bar_us")
    ohlcBars(events, barUs)
      .select(col("event_type"), col("bar_us"),
        col("open_cents"), col("close_cents"))
      .withColumn("prev_open", lag(col("open_cents"), 1).over(byType))
      .withColumn("prev_close", lag(col("close_cents"), 1).over(byType))
      .filter(col("prev_close") < col("prev_open") &&
        col("close_cents") > col("open_cents") &&
        col("open_cents") <= col("prev_close") &&
        col("close_cents") >= col("prev_open"))
      .select(col("event_type"), col("bar_us"),
        col("prev_open"), col("prev_close"),
        col("open_cents"), col("close_cents"))
      .orderBy("event_type", "bar_us")
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST: score the forecast "this hour's
    * event count = the same hour yesterday" per event_type — the standard
    * baseline every real forecasting model must beat, and the shape of a
    * capacity-planning backtest over the event stream.
    *
    * The hourly grid joins to itself on (event_type, hour − 24 h) — a
    * calendar-exact equi-join (a `lag(24)` window over observed rows
    * would silently misalign across gap hours). Hours with no
    * yesterday-observation are excluded (`n_missing_base` counts them),
    * matching how a production backtest treats cold starts. Absolute
    * errors, bias, and the worst miss are integer counts; MAE surfaces
    * as numerator + n so the consumer divides.
    *
    * Scale shape: the raw stream collapses to the hourly grid in ONE
    * map-side-combining aggregate (state ∝ hours × types); the self-join
    * and final per-type rollup move only grid-sized data.
    */
  def seasonalBacktest(events: DataFrame, seasonUs: Long = 86400000000L,
      barUs: Long = 3600000000L): DataFrame = {
    val grid = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        expr(s"(unix_micros(ts) div ${barUs}L) * ${barUs}L").as("bar_us"))
      .groupBy("event_type", "bar_us")
      .agg(count(lit(1)).as("cnt"))
    val base = grid.select(col("event_type"),
      (col("bar_us") + lit(seasonUs)).as("bar_us"), col("cnt").as("base_cnt"))
    grid.join(base, Seq("event_type", "bar_us"), "left")
      // the first season of hours has no base by construction; drop it so
      // n_missing_base measures real gaps, not the warm-up edge
      .filter(col("bar_us") >= grid.agg(min(col("bar_us"))).head().getLong(0) + seasonUs)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_hours"),
        sum(when(col("base_cnt").isNull, 1L).otherwise(0L)).as("n_missing_base"),
        sum(when(col("base_cnt").isNotNull,
          abs(col("cnt") - col("base_cnt")))).as("abs_err_sum"),
        sum(when(col("base_cnt").isNotNull,
          col("cnt") - col("base_cnt"))).as("bias_sum"),
        max(when(col("base_cnt").isNotNull,
          abs(col("cnt") - col("base_cnt")))).as("worst_abs_err"))
      .orderBy("event_type")
  }

  /** CUSUM CHANGEPOINT detection per series — the classic single
    * mean-shift locator over the hourly cents signal, kept ENTIRELY in
    * integer arithmetic so the verdict is engine-exact (the textbook
    * form subtracts the FP mean per step; cross-multiplying by n removes
    * the division):
    *
    *   D_i = n·S_i − i·S_n   (S_i = prefix sum of hourly totals)
    *
    * is n times the centered CUSUM; the i maximizing |D_i| is the
    * changepoint estimate, and the two sides' (sum, count) pairs are
    * emitted as exact rationals for the consumer to divide. Bounds:
    * |D_i| ≤ n·|S_n|, safely inside BIGINT for any per-series hour count
    * the fixture or a sharded 100 TB series reaches.
    *
    * Scale shape: hourly totals are ONE map-side-combining aggregate on
    * (series, hour); the prefix sums, the row index, the whole-series
    * totals, and the argmax rank all ride ONE exchange on the series key
    * (four window specs, one partitioning); ties on |D| break to the
    * earliest hour so the answer is unique.
    */
  def cusumChangepoint(events: DataFrame,
      barUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${barUs}L").as("bar"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "bar")
      .agg(sum(col("cents")).as("hour_cents"))
    val ordered = Window.partitionBy("event_type").orderBy("bar")
    val whole = Window.partitionBy("event_type")
    val scored = hourly
      .withColumn("s_i", sum(col("hour_cents")).over(ordered))
      .withColumn("i", row_number().over(ordered).cast("long"))
      .withColumn("s_n", sum(col("hour_cents")).over(whole))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("d", col("n") * col("s_i") - col("i") * col("s_n"))
      // the last index always has D_n = 0 and cannot split the series
      .filter(col("i") < col("n"))
    val pick = Window.partitionBy("event_type")
      .orderBy(abs(col("d")).desc, col("bar"))
    scored
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_hours"),
        (col("bar") * barUs).as("changepoint_us"),
        abs(col("d")).as("max_abs_d"),
        col("s_i").as("sum_before"), col("i").as("n_before"),
        (col("s_n") - col("s_i")).as("sum_after"),
        (col("n") - col("i")).as("n_after"))
      .orderBy("event_type")
  }

  /** BOLLINGER-BAND BREAKOUTS per series, INTEGER-EXACT: an hourly close
    * is a breakout when it leaves mean ± 2σ of the PRIOR `period` closes.
    * The float-free trick: with trailing sums S = Σx and Q = Σx² over n
    * bars, "x above the upper band" ⇔ (n·x − S) > 0 AND
    * (n·x − S)² > 4·(n·Q − S²) — both sides exact BIGINT products
    * (cents ≤ ~5·10⁴, n = 20 ⇒ the squared term ≤ ~10¹², and
    * n·Q − S² = n²·σ² ≤ ~10¹²; comfortable headroom), so the breakout
    * decision is bit-identical on any engine — no sqrt, no division.
    *
    * Scale shape: one aggregate to hourly bars (map-side combined), then
    * two trailing-frame window sums riding ONE exchange on the series
    * key; output is a per-series summary row. The bar count per series is
    * time-bounded, so the window state is too.
    */
  def bollingerBreakouts(events: DataFrame, period: Int = 20,
      barUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr(s"unix_micros(ts) div ${barUs}L").as("bar"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "bar")
      .agg(max_by(col("cents"), struct(col("us"), col("event_id"))).as("close"))
    val trail = Window.partitionBy("event_type").orderBy("bar")
      .rowsBetween(-period, -1)
    val scored = hourly
      .withColumn("n", count(lit(1)).over(trail))
      .withColumn("s", sum(col("close")).over(trail))
      .withColumn("q", sum(col("close") * col("close")).over(trail))
      .filter(col("n") === period)
      .withColumn("dev", col("n") * col("close") - col("s"))
      .withColumn("var4", lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .withColumn("above",
        when(col("dev") > 0 && col("dev") * col("dev") > col("var4"), 1L).otherwise(0L))
      .withColumn("below",
        when(col("dev") < 0 && col("dev") * col("dev") > col("var4"), 1L).otherwise(0L))
    scored.groupBy("event_type")
      .agg(count(lit(1)).as("n_eval"),
        sum(col("above")).as("n_above"),
        sum(col("below")).as("n_below"))
      .orderBy("event_type")
  }

  /** VWAP (volume-weighted average price) per hourly bar: the serving
    * form of [[ohlcBars]] when a size signal exists — here the integer
    * `k` field of the event's JSON payload plays volume (the same
    * extraction path as the JSON-projection query battery). vwap_cents =
    * ⌊Σ(cents·k) / Σk⌋ — exact integer division, engine-stable; bars
    * whose total volume is zero carry no average and are reported with a
    * NULL vwap rather than dropped (losing the bar would silently shrink
    * the time axis).
    *
    * Scale shape: row-local JSON extraction (codegen'd `get_json_object`,
    * no UDF) feeding ONE map-side-combined aggregate on (bar, series);
    * output ∝ bars × series. Σ(cents·k) per row ≤ 5·10⁶ and bars hold
    * bounded event counts, so BIGINT headroom is ~12 orders of magnitude.
    */
  def vwapBars(events: DataFrame, barUs: Long = 3600000000L): DataFrame = {
    events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${barUs}L * ${barUs}L").as("bar_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("vol"))
      .filter(col("vol").isNotNull)
      .groupBy("bar_us", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("vol")).as("volume"),
        sum(col("cents") * col("vol")).as("notional_cents"))
      .withColumn("vwap_cents",
        when(col("volume") > 0, expr("notional_cents div volume")))
      .orderBy("bar_us", "event_type")
  }

  /** TWAP (time-weighted average price) per series over irregular
    * events: each observation holds until the next one, so its weight is
    * the µs gap to the successor — the standard irregular-sampling
    * average (a plain mean over-weights bursts; duration weighting is
    * what "average level of the signal" actually means). The final
    * observation has no successor and contributes no duration — exactly
    * the right-open integral convention. twap_cents =
    * ⌊Σ(cents·dur_us) / Σdur_us⌋, all BIGINT: max Σ(cents·dur) ≈
    * 5·10⁴ · 2.6·10¹² ≈ 10¹⁷ per series at the fixture's one-month span
    * — inside BIGINT, and the oracle casts its HUGEINT sums back down.
    *
    * Scale shape: one lead() window and one aggregate, both on the
    * series-key exchange; ties on ts break by event_id so the ordering
    * is total and the durations engine-deterministic.
    */
  def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("span_us"),
        sum(col("cents") * col("dur_us")).as("weighted_cents"))
      .withColumn("twap_cents", expr("weighted_cents div span_us"))
      .orderBy("event_type")
  }

  /** INTER-ARRIVAL HISTOGRAM per series in log₂-second buckets — the
    * burstiness fingerprint (Poisson traffic is geometric across these
    * buckets; humans and retry storms are not). The logarithm is never
    * evaluated: bucket = the BINARY DIGIT COUNT of the gap in whole
    * seconds (= ⌊log₂ g⌋ + 1, with sub-second gaps in bucket 0) — an
    * integer-string length both engines compute exactly, and each
    * bucket's [lo, hi] second bounds are reconstructed by bit shifts.
    *
    * Scale shape: one lag() on the series-key exchange, then one
    * map-side-combined aggregate; output ∝ series × ~40 buckets.
    */
  /** DIURNAL PROFILE: hour-of-day × series activity (events, value sum,
    * and the hour's floor-bp share of the series total) — the seasonality
    * fingerprint behind capacity planning and anomaly baselines ("is 3am
    * volume normal FOR 3am"). Hour-of-day is pure integer arithmetic on
    * epoch-µs under the UTC session — (us div 3600000000) mod 24 — no
    * calendar/timezone library on either engine.
    *
    * Scale shape: ONE map-side-combined aggregate to series × 24 rows;
    * shares from a broadcast of the per-series totals (≤ |series| rows).
    */
  def diurnalProfile(events: DataFrame): DataFrame = {
    val hours = events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 3600000000L) % 24").as("hour_of_day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "hour_of_day")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    val totals = hours.groupBy("event_type")
      .agg(sum(col("n_events")).as("total_events"), sum(col("cents")).as("total_cents"))
    hours
      .join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("hour_of_day"), col("n_events"), col("cents"),
        expr("n_events * 10000 div total_events").as("event_share_bp"),
        expr("cents * 10000 div total_cents").as("value_share_bp"))
      .orderBy("event_type", "hour_of_day")
  }

  /** USER TENURE HISTOGRAM: users bucketed by lifetime span in whole
    * weeks, with activity density per bucket — the engagement-shape
    * readout (a spike at week 0 is drive-by traffic; a long tail is a
    * retained base). Per-user lifetime facts reduce in ONE aggregate
    * (first/last event day, distinct active days, events); the histogram
    * is a second metadata-scale aggregate. days = epoch-µs div 86.4e9 —
    * integer day indexes under the UTC session, engine-exact.
    */
  def tenureHistogram(events: DataFrame): DataFrame = {
    val perUser = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000L").as("day"))
      .groupBy("user_id")
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        countDistinct(col("day")).as("n_active_days"),
        count(lit(1)).as("n_events"))
      .withColumn("span_days", col("last_day") - col("first_day") + 1L)
      .withColumn("week_bucket", expr("(span_days - 1) div 7"))
    perUser
      .groupBy("week_bucket")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("n_active_days")).as("active_days"),
        expr("sum(n_active_days) * 1000 div sum(span_days)")
          .as("density_permille"))
      .orderBy("week_bucket")
  }

  /** CONVERSION-LAG HISTOGRAM: time from a user's FIRST view to their
    * FIRST purchase, bucketed in log₂ seconds (the digit-count trick of
    * [[interarrivalHistogram]]) — the funnel-latency distribution that
    * [[Sessions]]' funnel counts and the last-touch attribution query
    * don't expose (conversion RATE says nothing about conversion TIME,
    * and time-to-convert sets attribution windows and remarketing
    * cadence). Users who purchased before ever viewing are counted
    * separately (`n_inverted` — bot/backfill signal), not silently
    * dropped into a negative bucket.
    *
    * Scale shape: conditional min aggregates collapse events to one row
    * per user (map-side combined), then a metadata-scale histogram.
    */
  def conversionLag(events: DataFrame): DataFrame = {
    val firsts = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("us"))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase").isNotNull)
      // lag only for the forward direction: a "negative conversion lag"
      // is a data defect, not a latency — inverted users keep a NULL lag
      // under their own bucket instead of a misleading negative number
      .withColumn("lag_s",
        when(col("first_purchase") >= col("first_view"),
          expr("(first_purchase - first_view) div 1000000")))
    firsts
      .withColumn("bucket",
        when(col("first_purchase") < col("first_view"), lit(-1L))
          .otherwise(when(col("lag_s") <= 0L, lit(0L))
            .otherwise(length(bin(col("lag_s"))).cast("long"))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        min(col("lag_s")).as("min_lag_s"), max(col("lag_s")).as("max_lag_s"))
      .orderBy("bucket")
  }

  /** LOCAL-PEAK DETECTION over hourly close bars: a bar is a (strict)
    * peak when its close exceeds both neighbors — the minimal,
    * assumption-free event detector under every alerting rule
    * ("local high", "spike count"). Interior bars only (endpoints have
    * one neighbor and are not decidable). Integer cents comparisons ⇒
    * engine-exact; output per series: bars, decidable bars, peak/trough
    * counts, and the highest peak with its bar (max_by on a (cents, bar)
    * struct — deterministic because bars are unique per series).
    *
    * Scale shape: bar aggregation (map-side combined) + ONE lag/lead
    * window + one summary aggregate, all on the series-key exchange.
    */
  def peakDetection(events: DataFrame, barUs: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("bar")
    val bars = events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr(s"unix_micros(ts) div ${barUs}L").as("bar"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "bar")
      .agg(max_by(col("cents"), struct(col("us"), col("event_id"))).as("close"))
    bars
      .withColumn("prev", lag(col("close"), 1).over(w))
      .withColumn("next", lead(col("close"), 1).over(w))
      .withColumn("is_peak",
        (col("prev").isNotNull && col("next").isNotNull &&
          col("close") > col("prev") && col("close") > col("next")).cast("long"))
      .withColumn("is_trough",
        (col("prev").isNotNull && col("next").isNotNull &&
          col("close") < col("prev") && col("close") < col("next")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_bars"),
        sum(when(col("prev").isNotNull && col("next").isNotNull, 1L)
          .otherwise(0L)).as("n_decidable"),
        sum(col("is_peak")).as("n_peaks"),
        sum(col("is_trough")).as("n_troughs"),
        max(when(col("is_peak") === 1L, col("close"))).as("highest_peak_cents"),
        max_by(col("bar"),
          when(col("is_peak") === 1L, struct(col("close"), col("bar"))))
          .as("highest_peak_bar"))
      .orderBy("event_type")
  }

  def interarrivalHistogram(events: DataFrame): DataFrame = {
    events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_s",
        expr("(us - lag(us, 1) OVER (PARTITION BY event_type ORDER BY us, event_id)) div 1000000"))
      .filter(col("gap_s").isNotNull)
      .withColumn("bucket",
        when(col("gap_s") <= 0L, lit(0L))
          .otherwise(length(bin(col("gap_s"))).cast("long")))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"), max(col("gap_s")).as("max_gap_s"))
      .withColumn("lo_s",
        when(col("bucket") === 0L, 0L).otherwise(expr("shiftleft(1L, CAST(bucket AS INT) - 1)")))
      .withColumn("hi_s",
        when(col("bucket") === 0L, 0L).otherwise(expr("shiftleft(1L, CAST(bucket AS INT)) - 1")))
      .orderBy("event_type", "bucket")
  }

  /** THRESHOLD-RESET RUNNING TOTAL — the loyalty-voucher / budget-cap
    * fold: each user's purchase cents accumulate in order and the
    * accumulator RESETS to zero the moment it crosses the threshold
    * (issuing a "voucher"). The reset makes the recurrence
    * non-associative — `run(i) = 0 if run(i−1)+x(i) ≥ T else
    * run(i−1)+x(i)` depends on every prior reset decision — so NO
    * built-in window frame or prefix sum can express it; it is the
    * canonical example of the fold class `aggregate()` (Spark) /
    * `list_reduce` (the oracle) exists for.
    *
    * Scale shape: one keyed aggregate collects each user's ordered
    * (µs, event_id, cents) triples — state ∝ purchases per user, the
    * bound sessionization already carries — and the fold itself is a
    * map-side scalar loop inside codegen, no second shuffle, no
    * window sort of the whole fact table. Ordering is total ((µs, id)
    * — dq31's collision audit is why the id participates), so the
    * result is engine-exact integers.
    */
  def resetRunningTotal(events: DataFrame, thresholdCents: Long = 10000L): DataFrame = {
    val purchases = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
    purchases
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        expr("transform(array_sort(collect_list(struct(us, event_id, cents))), x -> x.cents)")
          .as("cs"))
      .select(col("user_id"), col("n_purchases"),
        expr(
          s"""aggregate(cs, named_struct('resets', 0L, 'run', 0L),
             |  (a, x) -> IF(a.run + x >= $thresholdCents,
             |    named_struct('resets', a.resets + 1L, 'run', 0L),
             |    named_struct('resets', a.resets, 'run', a.run + x)))""".stripMargin)
          .as("st"))
      .select(col("user_id"), col("n_purchases"),
        col("st.resets").as("n_vouchers"), col("st.run").as("residual_cents"))
      .orderBy("user_id")
  }

  /** BUSINESS-DAY LAG histogram — order date → first ship date measured
    * in WEEKDAYS, the SLA clock ops teams actually run on (a Friday
    * order shipping Monday is 1 business day late, not 3). Calendar
    * arithmetic is closed-form integer: with epoch day 0 a Thursday,
    * g(x) = 5·(x div 7) + lookup[x mod 7] counts business days in
    * [0, x), so lag = g(ship) − g(order) — no calendar-spine join, no
    * UDF, identical lookup array in both engines. One broadcast-safe
    * min-per-order aggregate on lineitem, one equi-join to orders, one
    * histogram aggregate.
    */
  def busdayLag(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def g(name: String) = expr(
      s"5 * ($name div 7) + element_at(array(0L, 1L, 2L, 2L, 2L, 3L, 4L), " +
        s"CAST($name % 7 AS INT) + 1)")
    val firstShip = lineitem
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(min(datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
        .cast("long")).as("ship_day"))
    orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("order_day"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        (g("ship_day") - g("order_day")).as("busdays"))
      .groupBy("o_orderpriority", "busdays")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority", "busdays")
  }

  /** AUTOCORRELATION sufficient statistics of the daily revenue series
    * at lags 1..`maxLag` — the diagnostic that decides whether a
    * forecasting/backtest operator (e29) should model weekly structure
    * at all, and the standard residual-whiteness check after it runs.
    *
    * Exactness: ACF's mean-centering is rational (μ = S/n), so instead
    * of floats the operator centers on the FLOOR mean μ̂ = S div n
    * (identical integer in both engines, S ≥ 0). The numerator
    * Σ d_t·d_{t+k} and denominator Σ d_t² accumulate in DECIMAL(38,0)
    * and only the bounded quotients ship: ρ̂ at permille and ppm
    * resolution, exact truncating divisions of the exact sums (Spark
    * `div` and DuckDB `//` both truncate toward zero on negatives —
    * re-verified for HUGEINT, so the possibly-NEGATIVE numerators are
    * engine-exact). The r10 form emitted the raw BIGINT sums and the
    * r11 full-registry sf10 gate caught Σd² crossing 2⁶³ at 100×
    * (deviations grow ∝ scale, squares ∝ scale² — the e58 class; its
    * own scaladoc had mis-estimated the headroom as ~sf10³). Same
    * resolution contract as [[weekdayAnova]]: a 1-unit error in either
    * 25-digit sum flips the ppm column.
    *
    * Lag pairing is BY CALENDAR DAY (b.day = a.day + k), not by row
    * offset, so a missing day drops its pairs identically in both
    * engines instead of silently shifting the alignment; n_pairs makes
    * the coverage visible.
    *
    * Scale shape: the only data-volume exchange is the map-side-
    * combining daily aggregate (output ∝ days). Everything after —
    * the 1-row mean, the day-keyed self-join, the per-lag sums — is
    * metadata-scale (days × maxLag rows), and the join is broadcast.
    */
  def autocorrelation(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    // sequence(1, 0) DESCENDS in Spark — maxLag = 0 would silently emit a
    // bogus lag-0 row (trivially rho = 1) instead of an empty result.
    require(maxLag >= 1, s"autocorrelation: maxLag=$maxLag must be >= 1")
    val daily = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
    val mu = daily.agg(expr("sum(x) div count(1)").as("mu"))
    val dev = daily.crossJoin(broadcast(mu))
      .select(col("day"), (col("x") - col("mu")).as("d"))
    val den = dev.agg(sum(expr("cast(d as decimal(19,0))") *
      expr("cast(d as decimal(19,0))")).as("den"))
    val future = dev.select(col("day").as("f_day"), col("d").as("f_d"))
    dev
      .select(explode(expr(s"sequence(1L, ${maxLag}L)")).as("lag"),
        col("day"), col("d"))
      .join(broadcast(future), col("f_day") === col("day") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("cast(d as decimal(19,0))") *
          expr("cast(f_d as decimal(19,0))")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        expr("(num * 1000) div nullif(den, 0)").as("rho_permille"),
        expr("(num * 1000000) div nullif(den, 0)").as("rho_ppm"))
      .orderBy("lag")
  }

  /** PERIOD-OVER-PERIOD deltas — month-over-month and year-over-year
    * revenue change in floor permille, the first page of every BI
    * report. Alignment is BY CALENDAR KEY (month index = 12·year +
    * month − 1), joined at mk−1 and mk−12 — NOT a row-offset lag(), so
    * a month with zero orders yields NULL deltas on both engines
    * instead of silently comparing against the wrong month.
    *
    * Deltas can be NEGATIVE: Spark's `div` and DuckDB's `//` both
    * truncate toward zero (verified for [[Similarity.labelCohesion]]),
    * so the quotient is engine-exact without a pmod dance.
    *
    * Scale shape: the fact table collapses in one map-side-combining
    * monthly aggregate (output ∝ months); both alignment joins are
    * broadcast self-joins on that metadata-scale frame.
    */
  def periodOverPeriod(orders: DataFrame): DataFrame = {
    val monthly = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("mk"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val prev = monthly.select((col("mk") + 1L).as("mk"), col("cents").as("prev_cents"))
    val yoy = monthly.select((col("mk") + 12L).as("mk"), col("cents").as("yoy_cents"))
    monthly
      .join(broadcast(prev), Seq("mk"), "left")
      .join(broadcast(yoy), Seq("mk"), "left")
      .select(expr("mk div 12").as("yr"), (col("mk") % 12 + 1L).as("mo"),
        col("cents"), col("prev_cents"), col("yoy_cents"),
        expr("(cents - prev_cents) * 1000 div prev_cents").as("mom_permille"),
        expr("(cents - yoy_cents) * 1000 div yoy_cents").as("yoy_permille"))
      .orderBy("yr", "mo")
  }

  /** EWMA of the daily revenue series with POWER-OF-TWO weights — the
    * smoothing view the α-recursive EWMA cannot offer exactly: a float
    * recursion diverges bit-wise across engines, but the truncated form
    * with α = 1/2 over a `horizon`-day window has weights 2^(H−1−i)
    * that are exact BIGINTs, so the whole statistic sits under the hash
    * gate. Reported as an exact fraction: `ewma_num` over `wt_den`
    * (the sum of the weights ACTUALLY PRESENT — a gap day drops its
    * term from both, so coverage holes renormalize instead of silently
    * dragging the average toward zero; `n_terms` makes them visible).
    *
    * Alignment is BY CALENDAR DAY (contributor day = anchor − i), the
    * same contract as [[autocorrelation]] — never a row offset.
    *
    * Magnitude: daily whole-dollar revenue ~10⁷ at sf0.1; the largest
    * weighted term is x·2^(H−1) ≈ 5·10⁹ and the sum of ≤ H terms stays
    * ~10¹⁰ — BIGINT-safe beyond sf1000.
    *
    * Scale shape: the fact table collapses in one map-side-combining
    * daily aggregate (output ∝ days); the H-way fan-out and the
    * alignment join both run on that metadata-scale frame, with the
    * contributor side broadcast.
    */
  def ewma(orders: DataFrame, horizon: Int = 10): DataFrame = {
    require(horizon >= 1 && horizon <= 62,
      s"ewma: horizon=$horizon must fit power-of-two BIGINT weights")
    val daily = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
    val hist = daily.select(col("day").as("h_day"), col("x").as("h_x"))
    daily
      .select(col("day"), col("x"),
        explode(expr(s"sequence(0L, ${horizon - 1}L)")).as("i"))
      .join(broadcast(hist), col("h_day") === col("day") - col("i"))
      .groupBy("day", "x")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr(s"h_x * shiftleft(1L, cast(${horizon - 1} - i as int))"))
          .as("ewma_num"),
        sum(expr(s"shiftleft(1L, cast(${horizon - 1} - i as int))"))
          .as("wt_den"))
      .orderBy("day")
  }

  /** KAPLAN-MEIER survival table over customer lifetimes — the
    * SUFFICIENT STATISTICS (n_risk, d_events per event time), not the
    * telescoping survival product: the product's numerators/denominators
    * grow past any fixed-width integer and its float form diverges
    * bit-wise across engines, while Ŝ(t) = Π (1 − d/n) reconstructs
    * exactly from these columns — the same report-the-exact-fraction
    * contract as [[autocorrelation]] and [[ewma]].
    *
    * Observation scheme: a customer's observed time is their tenure
    * (last order − first order, days). Customers whose last order is
    * more than `churnDays` before the corpus horizon (global max order
    * date) are CHURNED (event observed at their tenure); the rest are
    * right-CENSORED at theirs — they were still active when the data
    * ends. n_risk(t) counts everyone with observed time ≥ t; only
    * event times (d_events > 0) emit a row, per the KM estimator.
    *
    * Scale shape: the fact table collapses in one map-side-combining
    * per-customer min/max (output ∝ customers), then a per-tenure-value
    * count (output ∝ distinct tenure days, bounded by the calendar).
    * The reverse-cumulative n_risk window runs over THAT metadata-scale
    * frame — the unpartitioned window is ∝ calendar days, never rows.
    */
  def kaplanMeier(orders: DataFrame, churnDays: Int = 365): DataFrame = {
    val perCust = orders
      .filter(col("o_orderdate").isNotNull)
      .groupBy("o_custkey")
      .agg(min(col("o_orderdate")).as("first_d"),
        max(col("o_orderdate")).as("last_d"))
    val horizon = orders.agg(max(col("o_orderdate")).as("max_d"))
    val byT = perCust.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        (datediff(col("max_d"), col("last_d")) > churnDays).cast("long")
          .as("churned"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_at_t"), sum("churned").as("d_events"))
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("n_risk", sum("n_at_t").over(w))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"),
        (col("n_at_t") - col("d_events")).as("n_censored_at_t"))
      .orderBy("t")
  }

  /** LINEAR INTERPOLATION of missing days in the daily revenue series,
    * as an EXACT RATIONAL — the two-sided complement to the forward
    * fill of [[graft.operators.WindowOps.gapFill]]: a gap day d between
    * surviving neighbors (p, x_p) and (q, x_q) gets
    * x̂(d) = (x_p·(q−d) + x_q·(d−p)) / (q−p), reported as the BIGINT
    * numerator `interp_num` over denominator `gap_den` — floats never
    * enter, so the estimate hash-matches across engines (the same
    * fraction contract as [[autocorrelation]]). Only FILLED days emit;
    * the bracketing day indexes make the gap length auditable.
    *
    * Neighbor discovery is two IGNORE-NULLS window passes over the
    * calendar spine (last non-gap before, first non-gap after), which
    * both engines define identically. Leading/trailing gaps have no
    * bracket and are (correctly) absent — extrapolation is a modeling
    * decision, not a fill.
    *
    * Scale shape: the fact table collapses in one map-side-combining
    * daily aggregate; the spine, the two windows, and the output are
    * all ∝ calendar days — the unpartitioned windows run at metadata
    * scale, never over raw rows (at 100 TB you'd partition the spine
    * by series key; the single-series form here is the degenerate
    * window the calendar bounds).
    */
  def linearInterp(orders: DataFrame): DataFrame = {
    val daily = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
    val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("day"))
    val wB = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wF = Window.orderBy("day")
      .rowsBetween(1, Window.unboundedFollowing)
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), col("x"),
        last(when(col("x").isNotNull, col("day")), ignoreNulls = true)
          .over(wB).as("p"),
        last(col("x"), ignoreNulls = true).over(wB).as("x_p"),
        first(when(col("x").isNotNull, col("day")), ignoreNulls = true)
          .over(wF).as("q"),
        first(col("x"), ignoreNulls = true).over(wF).as("x_q"))
      .filter(col("x").isNull && col("p").isNotNull && col("q").isNotNull)
      .select(col("day"), col("p"), col("q"),
        (col("x_p") * (col("q") - col("day")) +
          col("x_q") * (col("day") - col("p"))).as("interp_num"),
        (col("q") - col("p")).as("gap_den"))
      .orderBy("day")
  }

  /** LTV TRIANGLE — cumulative revenue per acquisition cohort by weeks
    * since acquisition, the standard lifetime-value report (each cohort
    * is one row-series; reading down a column compares cohorts at equal
    * age; the right edge is ragged because young cohorts haven't lived
    * that long — hence "triangle"). Complements the COUNT-based
    * retention triangle (e13) with the REVENUE dimension.
    *
    * Cohort = floor-week of the customer's first order; age = floor-
    * weeks between order and that first order, capped at `maxWeeks`
    * (the report's width — orders past the cap are excluded, as in the
    * BI artifact this reproduces). All arithmetic is integer day/week
    * math and exact cents; `ltv_cents` is the floor per-customer
    * cumulative value.
    *
    * Scale shape: one map-side-combining first-order aggregate
    * (∝ customers), one shuffle join back on the customer key, one
    * (cohort, age) aggregate — then the cumulative window runs over the
    * cohort×age grid (metadata scale). n_active is a per-cell distinct,
    * state ∝ cohort customers.
    */
  def ltvTriangle(orders: DataFrame, maxWeeks: Int = 12): DataFrame = {
    val o = orders
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("day").as("d0"))
    val sized = first.groupBy(expr("d0 div 7").as("cohort_wk"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(first, Seq("o_custkey"))
      .select(expr("d0 div 7").as("cohort_wk"),
        expr("(day - d0) div 7").as("weeks_since"),
        col("o_custkey"), col("cents"))
      .filter(col("weeks_since") < maxWeeks)
      .groupBy("cohort_wk", "weeks_since")
      .agg(countDistinct("o_custkey").as("n_active"),
        sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_wk").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_rev_cents", sum("rev_cents").over(w))
      .join(broadcast(sized), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("weeks_since"), col("n_active"),
        col("rev_cents"), col("cum_rev_cents"), col("cohort_size"),
        expr("cum_rev_cents div cohort_size").as("ltv_cents"))
      .orderBy("cohort_wk", "weeks_since")
  }

  /** DEFERRED REVENUE RECOGNITION — each day's booked revenue is
    * recognized evenly over the following `spreadDays` days, the
    * finance-warehouse schedule behind subscription/contract
    * accounting. Exactness is a reconciliation property, not a
    * nicety: each source day contributes ⌊v/N⌋ to its first N−1
    * recognition days and v − (N−1)·⌊v/N⌋ to the last one, so every
    * booked cent is recognized EXACTLY once (the same floor-plus-
    * residual discipline as [[graft.operators.Sessions
    * .decayAttribution]]) — an auditor can sum the output against the
    * bookings and get zero drift.
    *
    * Scale shape: bookings collapse in one map-side-combining daily
    * aggregate; the spread is a `spreadDays`-way fan-out of THAT
    * metadata-scale frame joined to nothing — work ∝ days × N, never
    * rows × N.
    */
  def revenueRecognition(orders: DataFrame, spreadDays: Int = 30): DataFrame = {
    require(spreadDays >= 1, s"revenueRecognition: spreadDays=$spreadDays")
    val daily = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
    daily
      .select(col("day"), col("v"),
        explode(expr(s"sequence(0L, ${spreadDays - 1}L)")).as("i"))
      .select((col("day") + col("i")).as("rec_day"),
        when(col("i") < spreadDays - 1, expr(s"v div $spreadDays"))
          .otherwise(expr(s"v - ${spreadDays - 1} * (v div $spreadDays)"))
          .as("cents"))
      .groupBy("rec_day")
      .agg(count(lit(1)).as("n_source_days"),
        sum("cents").as("recognized_cents"))
      .orderBy("rec_day")
  }

  /** DAILY PERCENTILE SERIES — exact discrete P50/P90/P99 of the event
    * value per day, the ops-dashboard latency/size panel. Same
    * count-based order-statistic scheme as
    * [[graft.operators.Quality.winsorizedStats]] (smallest v with
    * #(x ≤ v) ≥ k, k = (n−1)·p div 100 + 1): NO per-row sort — the raw
    * stream collapses in a map-side-combining (day, cents) count, the
    * cumulative window runs over DISTINCT values within a day, and the
    * three ranks read off the same cumulative pass. Interpolating
    * `percentile` calls never appear (their float results don't
    * hash-match across engines).
    */
  def dailyPercentiles(events: DataFrame): DataFrame = {
    val counts = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val cum = counts
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("day").orderBy("cents")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("day")))
    cum.groupBy("day")
      .agg(max("n").as("n_events"),
        min(when(col("cum") >= expr("(n - 1) * 50 div 100 + 1"),
          col("cents"))).as("p50_cents"),
        min(when(col("cum") >= expr("(n - 1) * 90 div 100 + 1"),
          col("cents"))).as("p90_cents"),
        min(when(col("cum") >= expr("(n - 1) * 99 div 100 + 1"),
          col("cents"))).as("p99_cents"))
      .orderBy("day")
  }

  /** OPEN-ORDER BACKLOG over time, event-sourced — how many orders are
    * in flight each day (placed but not yet fully shipped), computed
    * the only way that scales: each order contributes a +1 DELTA on its
    * placement day and a −1 on the day AFTER its last line ships; the
    * backlog is the running sum of the daily delta stream. The naive
    * per-day recount ("count orders with a ≤ d < b for every d") scans
    * the fact table once per output day — quadratic at scale; the delta
    * stream visits each order exactly twice.
    *
    * Scale shape: one per-order max-shipdate aggregate (map-side
    * combining), a 2-row-per-order delta projection collapsed into a
    * per-day sum, and the cumulative window over the day grid only.
    */
  def openOrderBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dayOf = (c: Column) =>
      datediff(c, lit("1970-01-01").cast("date")).cast("long")
    val shipped = lineitem
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(dayOf(col("l_shipdate"))).as("last_ship"))
    val spans = orders
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), dayOf(col("o_orderdate")).as("opened"))
      .join(shipped, Seq("o_orderkey"))
    val deltas = spans
      .select(col("opened").as("day"), lit(1L).as("opened_d"),
        lit(0L).as("closed_d"))
      .unionAll(spans.select((col("last_ship") + 1).as("day"),
        lit(0L).as("opened_d"), lit(1L).as("closed_d")))
      .groupBy("day")
      .agg(sum("opened_d").as("n_opened"), sum("closed_d").as("n_closed"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("open_backlog",
        sum(col("n_opened") - col("n_closed")).over(w))
      .orderBy("day")
  }

  /** 4-4-5 FISCAL CALENDAR aggregation — revenue rolled up to the
    * retail-standard fiscal periods (13-week quarters split 4+4+5
    * weeks), which exist precisely because calendar months have unequal
    * numbers of weekends and wreck comparability. The mapping is PURE
    * INTEGER arithmetic from a fiscal epoch: week = days-since-epoch
    * div 7, fiscal year = week div 52, quarter = (week mod 52) div 13,
    * period-in-quarter from the 4/4/5 week split — identical in both
    * engines with no calendar library. (Real 4-4-5 calendars insert a
    * 53rd week every 5-6 years; the fixed-52 form here drifts ~1 day/yr
    * against the solar calendar — documented trade, irrelevant to the
    * aggregation shape.)
    *
    * Scale shape: one map-side-combining aggregate on derived integer
    * keys; the fiscal math is codegen'd column arithmetic on the scan.
    */
  def fiscalCalendar(orders: DataFrame,
      epoch: String = "1992-01-01"): DataFrame = {
    orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull &&
        col("o_orderdate") >= lit(epoch).cast("date"))
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        expr(s"""cast(datediff(o_orderdate, date'$epoch') as bigint)
                | div 7""".stripMargin).as("wk"))
      .select(col("cents"),
        expr("wk div 52").as("fiscal_year"),
        expr("(wk % 52) div 13").as("fq"),
        expr("(wk % 52) % 13").as("wq"))
      .select(col("cents"), col("fiscal_year"),
        (col("fq") * 3 + when(col("wq") < 4, 1L)
          .when(col("wq") < 8, 2L).otherwise(3L)).as("fiscal_period"))
      .groupBy("fiscal_year", "fiscal_period")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
      .orderBy("fiscal_year", "fiscal_period")
  }

  /** WEEKDAY ANOVA sufficient statistics — how much of daily revenue
    * variance the day-of-week explains: the between-group and total
    * sums of squares whose ratio is η² (the strength-of-seasonality
    * readout behind e29's backtest and e38's diurnal profile; η² → 0
    * says don't bother modeling weekday structure). Exactness: the
    * grand mean is the FLOOR mean μ̂ = S div n (the
    * [[autocorrelation]] convention) and group means are likewise
    * floored, so SST = Σ(x−μ̂)² and SSB = Σ n_g·(μ̂_g−μ̂)² are exact
    * integers of a DEFINED statistic (floor-mean ANOVA) — the float
    * form would diverge bit-wise.
    *
    * The sums of squares are DECIMAL(38,0) internally and only the
    * bounded quotients are emitted (η̂² at permille and ppm
    * resolution, exact floor divisions of the exact sums): daily
    * deviations grow ∝ scale, so Σdev² grows ∝ scale² — at 100×
    * (sf10) SST crosses 2⁶³ and the r10 BIGINT form died with an ANSI
    * ARITHMETIC_OVERFLOW (found by the r11 full-registry sf10 gate).
    * DECIMAL(38,0) is the per-group-aggregate zone where the repo
    * accepts decimal cost (one row per group, never per-candidate),
    * headroom to ~10³⁸ ≈ sf10⁹, and any further overflow still fails
    * loudly under ANSI. The ppm column keeps a strong exactness
    * witness (a 1-unit error in either 25-digit sum flips it) while
    * every output column stays a BIGINT the oracle can mirror without
    * HUGEINT/DECIMAL result types.
    *
    * Scale shape: one map-side-combining daily aggregate, one 7-row
    * group frame, two broadcast joins — nothing larger than the day
    * grid is ever windowed or shuffled.
    */
  def weekdayAnova(orders: DataFrame): DataFrame = {
    val daily = orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
      .withColumn("dow", expr("day % 7"))
    val grand = daily.agg(expr("sum(x) div count(1)").as("mu"),
      count(lit(1)).as("n"))
    val groups = daily.groupBy("dow")
      .agg(expr("sum(x) div count(1)").as("mu_g"), count(lit(1)).as("n_g"))
    val sst = daily.crossJoin(broadcast(grand))
      .agg(sum(expr("cast(x - mu as decimal(19,0))") *
        expr("cast(x - mu as decimal(19,0))")).as("sst"),
        max("n").as("n_days"))
    val ssb = groups.crossJoin(broadcast(grand))
      .agg(sum(expr("cast(n_g as decimal(19,0))") *
        expr("cast(mu_g - mu as decimal(19,0))") *
        expr("cast(mu_g - mu as decimal(19,0))")).as("ssb"))
    sst.crossJoin(broadcast(ssb))
      .select(col("n_days"),
        expr("(ssb * 1000) div nullif(sst, 0)").as("eta2_permille"),
        expr("(ssb * 1000000) div nullif(sst, 0)").as("eta2_ppm"))
  }
}
