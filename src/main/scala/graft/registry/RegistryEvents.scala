package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, events/time-series/sessionization tier (e*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryEvents {

  /** Shared SCD2-reconstruction CTE prefix (dim → nib → upd → merged):
    * ONE encoding of the e2 merge semantics, composed into both the
    * e2_scd2_merge and e11_pit_lookup oracles so they can never silently
    * encode different SCD2 states.
    */
  private val scd2MergedCte: String =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      |), nib AS (
      |  SELECT c_custkey,
      |    instr('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1 AS nb
      |  FROM customer
      |), upd AS (
      |  SELECT d.c_custkey, 'RELOCATED' AS c_mktsegment, d.c_acctbal
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb < 4
      |  UNION ALL
      |  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb >= 4 AND nb < 6
      |  UNION ALL
      |  SELECT d.c_custkey + 10000000, 'NEWSEG', 0.0
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb >= 14
      |), merged AS (
      |  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
      |         CAST(0 AS BIGINT) AS valid_from,
      |         CASE WHEN u.c_custkey IS NOT NULL AND
      |                   (u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |                    u.c_acctbal IS DISTINCT FROM d.c_acctbal)
      |              THEN CAST(1 AS BIGINT) END AS valid_to,
      |         NOT (u.c_custkey IS NOT NULL AND
      |              (u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |               u.c_acctbal IS DISTINCT FROM d.c_acctbal)) AS is_current
      |  FROM dim d LEFT JOIN upd u USING (c_custkey)
      |  UNION ALL
      |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
      |         CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
      |  FROM upd u LEFT JOIN dim d USING (c_custkey)
      |  WHERE d.c_custkey IS NULL OR
      |        u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |        u.c_acctbal IS DISTINCT FROM d.c_acctbal
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Correlated scalar + EXISTS subqueries (Catalyst decorrelates both to
    // aggregate/semi joins): orders strictly above their customer's mean
    // order value, integer cross-multiplied so no FP average compares.
    "e9_correlated_sql" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_sqlv")
      s.sql("""SELECT o_orderkey, o_custkey,
              |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              |FROM orders_sqlv o
              |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
              |      (SELECT COUNT(*) FROM orders_sqlv o2
              |       WHERE o2.o_custkey = o.o_custkey)
              |    > (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
              |       FROM orders_sqlv o2 WHERE o2.o_custkey = o.o_custkey)
              |  AND EXISTS (SELECT 1 FROM orders_sqlv o3
              |              WHERE o3.o_custkey = o.o_custkey
              |                AND o3.o_orderstatus = 'F')
              |ORDER BY o_orderkey""".stripMargin)
    }),
    // The streaming tumbling-window aggregate run as a batch query: same
    // window()/groupBy spec as EventStream.windowedCounts (watermark is a
    // batch no-op), integer-cents measures so the oracle can hash it —
    // putting the stream aggregation's SEMANTICS under the DuckDB gate.
    "e10_tumbling_window" -> ((s, dir) =>
      graft.streaming.EventStream.windowedCountsExact(Tables.events(s, dir))
        .orderBy("window_start_s", "event_type")),
    "e1_json_extract" -> ((s, dir) => TextOps.jsonExtract(Tables.events(s, dir))),
    // SCD Type-2 merge (versioned dimension upsert): a deterministic CDC
    // batch derived from md5-nibble buckets of the customer key exercises
    // close+insert, no-op, and plain-insert branches in one merge pass.
    "e2_scd2_merge" -> ((s, dir) => MergeOps.scd2Demo(Tables.customer(s, dir))),
    // Point-in-time SCD2 resolution: orders joined to the dimension AS OF
    // t=0 and t=1 side by side. Each PIT side collapses to one version
    // per key BEFORE the fact join (map-side filter), so both joins stay
    // plain equi-joins.
    "e11_pit_lookup" -> ((s, dir) => MergeOps.pitLookupDemo(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    // CDC compaction: latest row per user by monotone event_id (ranked by
    // id, not the ns timestamp — sub-µs ties rank nondeterministically
    // after precision conversion). One row per key → user_id sort is total.
    "e3_latest_per_key" -> ((s, dir) => MergeOps.latestByKey(
      Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
      "user_id", "event_id").orderBy("user_id")),
    // Incremental aggregate maintenance contract: snapshot ⊕ delta must
    // equal the one-shot aggregate, exactly (integer cents state).
    "e4_incremental_agg" -> ((s, dir) => Quality.incrementalAggContract(Tables.events(s, dir))),
    // Batch sessionization: inactivity-gap session carving per user (the
    // batch analog of the streaming session_window), integer-µs endpoints.
    "e6_sessionize" -> ((s, dir) => Sessions.sessionize(Tables.events(s, dir))),
    // E4 SQL front door, oracle-proven: the Athena-style consumption SQL
    // (reference b3_transform.py:367-380 shape) runs VERBATIM through
    // spark.sql over a registered view — the text-SQL path a reference
    // user migrates to, not just the DataFrame API. Money stays in cents.
    "e5_sql_front_door" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_sqlv")
      s.sql("""SELECT user_id,
              |       year(to_date(ts)) AS year, month(to_date(ts)) AS month,
              |       COUNT(*) AS total_registros,
              |       SUM(event_id) AS volume_total,
              |       SUM(CAST(round(value * 100) AS BIGINT)) AS total_cents
              |FROM events_sqlv
              |WHERE value IS NOT NULL AND ts IS NOT NULL
              |  AND user_id IS NOT NULL AND event_id IS NOT NULL
              |GROUP BY user_id, year(to_date(ts)), month(to_date(ts))
              |ORDER BY user_id, year, month""".stripMargin)
    }),
    // Right-to-erasure audit: per-subject rows-removed proof, including
    // never-existed subjects (found = false).
    "e8_erasure_audit" -> ((s, dir) => Quality.erasureAuditDemo(Tables.events(s, dir))),
    // Sequential funnel: view -> click-at-or-after -> purchase-at-or-after,
    // chained window minima over ONE user exchange; order matters.
    "e12_funnel" -> ((s, dir) => Sessions.funnel(Tables.events(s, dir))),
    // Last-touch attribution: purchases tied to the most recent click
    // within 1h via the merged-stream as-of carry (one keyed exchange).
    "e17_attribution" -> ((s, dir) => Sessions.lastTouchAttribution(Tables.events(s, dir))),
    // Cohort retention: week-of-first-event cohorts x week offset, all
    // per-user work on ONE user_id exchange (collect_set, not
    // distinct+self-join); anchor-day arithmetic, engine-independent.
    "e13_cohort_retention" -> ((s, dir) => Sessions.cohortRetention(Tables.events(s, dir))),
    // Sliding 30-min/10-min windows through Spark's NATIVE window()
    // generator (the op streaming time-windows compile to); oracle
    // re-derives the epoch-aligned starts with integer arithmetic.
    "e14_sliding_window" -> ((s, dir) => Sessions.slidingWindowStats(Tables.events(s, dir))),
    // NATIVE session_window (boundary-INCLUSIVE: a gap of exactly 1h
    // merges — spec-witnessed); oracle re-derives boundaries
    // gaps-and-islands-style with > in integer µs. One user_id exchange
    // + in-partition session merge.
    "e15_session_window" -> ((s, dir) => Sessions.nativeSessionWindows(Tables.events(s, dir))),
    // Erasure PROPAGATION contract: incremental repair of the derived
    // artifacts (band index, corpus signatures, IVF lists) equals each
    // artifact rebuilt from the erased corpus, and no erased key survives
    // — all booleans driver-witnessed TRUE (d4c pattern).
    "e8b_erasure_propagation" -> ((s, dir) =>
      Erasure.erasureContract(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    // First-order Markov transition matrix over each user's event stream:
    // lag pairs on ONE user_id exchange, then a |type|^2 metadata-scale
    // grid with integer basis-point out-shares and floor-average gaps.
    "e16_transitions" -> ((s, dir) => Sessions.eventTransitions(Tables.events(s, dir))),
    // Snapshot diff: added/removed/changed between two table versions via
    // one full-outer join; unchanged mass dropped before the sort.
    "e7_snapshot_diff" -> ((s, dir) => MergeOps.snapshotDiffDemo(Tables.orders(s, dir))),
    // Daily-revenue autocorrelation at lags 1..7: exact integer
    // numerator/denominator pairs (floor-mean centering), calendar-day
    // lag alignment — the weekly-seasonality diagnostic behind e29.
    "e45_autocorrelation" -> ((s, dir) =>
      TimeSeries.autocorrelation(Tables.orders(s, dir))),
    // Month-over-month / year-over-year revenue deltas, calendar-key
    // aligned (mk−1 / mk−12 joins), truncating div verified both engines.
    "e46_period_over_period" -> ((s, dir) =>
      TimeSeries.periodOverPeriod(Tables.orders(s, dir))),
    // Power-of-two EWMA of daily revenue: exact BIGINT fraction,
    // calendar-day alignment, gap days renormalize via wt_den.
    "e47_ewma" -> ((s, dir) => TimeSeries.ewma(Tables.orders(s, dir))),
    // Kaplan-Meier survival table: exact (n_risk, d_events) sufficient
    // statistics per event time; windows over distinct tenure days only.
    "e48_kaplan_meier" -> ((s, dir) =>
      TimeSeries.kaplanMeier(Tables.orders(s, dir))),
    // Exact-rational linear interpolation of gap days in daily revenue:
    // two IGNORE-NULLS window passes over the calendar spine.
    "e49_linear_interp" -> ((s, dir) =>
      TimeSeries.linearInterp(Tables.orders(s, dir))),
    // Time-decay multi-touch attribution: floor shares + residual to the
    // most recent touch — credits reconcile to purchase value exactly.
    "e50_decay_attribution" -> ((s, dir) =>
      Sessions.decayAttribution(Tables.events(s, dir))),
    // LTV triangle: cumulative cohort revenue by weeks-since-acquisition
    // — exact cents, cumulative window over the cohort×age grid only.
    "e51_ltv_triangle" -> ((s, dir) =>
      TimeSeries.ltvTriangle(Tables.orders(s, dir))),
    // Deferred revenue recognition: each day's bookings spread over 30
    // days with floor + last-day residual — zero reconciliation drift.
    "e53_rev_recognition" -> ((s, dir) =>
      TimeSeries.revenueRecognition(Tables.orders(s, dir))),
    // Daily P50/P90/P99 of event value: discrete order statistics from
    // the count-based cumulative pass — distinct-value state per day.
    "e54_daily_percentiles" -> ((s, dir) =>
      TimeSeries.dailyPercentiles(Tables.events(s, dir))),
    // Open-order backlog: ±1 delta stream (placement / day after last
    // ship) with a running sum over the day grid — never per-day scans.
    "e55_open_orders" -> ((s, dir) =>
      TimeSeries.openOrderBacklog(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // 4-4-5 fiscal periods from pure integer week arithmetic — the
    // retail calendar without a calendar library.
    "e56_fiscal_calendar" -> ((s, dir) =>
      TimeSeries.fiscalCalendar(Tables.orders(s, dir))),
    // Weekly growth ledger: new / retained / resurrected / churned via
    // first-seen MIN + week-shifted joins — work ∝ distinct user-weeks.
    "e57_growth_accounting" -> ((s, dir) =>
      Sessions.growthAccounting(Tables.events(s, dir))),
    // Weekday ANOVA sufficient stats: floor-mean SSB/SST exact BIGINTs —
    // η² permille says whether weekday structure is worth modeling.
    "e58_weekday_anova" -> ((s, dir) =>
      TimeSeries.weekdayAnova(Tables.orders(s, dir))),
    // DAU/WAU stickiness: Σ daily actives ×1000 div (7×weekly actives) —
    // two distinct frames, work ∝ distinct user-days.
    "e59_stickiness" -> ((s, dir) =>
      Sessions.stickiness(Tables.events(s, dir))),
    // Cumulative adoption via first-seen linearization — never a running
    // COUNT(DISTINCT) (quadratic state at scale).
    "e52_adoption_curve" -> ((s, dir) =>
      Sessions.adoptionCurve(Tables.events(s, dir))),
    // OHLC resampling: hourly open/high/low/close/volume bars per event
    // type — min_by/max_by on a (us, event_id) struct, ONE hash aggregate
    // with map-side combine, no sort/window over the raw stream.
    "e18_ohlc_bars" -> ((s, dir) => TimeSeries.ohlcBars(Tables.events(s, dir))),
    // Interval union per user (30-min activity holds): running-max island
    // merge, one user_id exchange end-to-end, integer-µs coverage stats.
    "e19_interval_coverage" -> ((s, dir) => TimeSeries.intervalCoverage(Tables.events(s, dir))),
    // Sequential path mining: consecutive event-type trigrams per user —
    // two leads over one window, grid aggregation ≤ |type|³ rows.
    "e20_trigram_paths" -> ((s, dir) => Sessions.trigramPaths(Tables.events(s, dir))),
    // Per-series OLS trend slope as an exact integer rational (num/den
    // BIGINTs, FP division left to the consumer): minutes-offset x from
    // each series' own start, window min + aggregate share one user_id
    // exchange.
    "e24_trend_slopes" -> ((s, dir) => TimeSeries.trendSlopes(Tables.events(s, dir))),
    // Max drawdown per series: running-max window + aggregate + earliest
    // trough via an argmax equi-join — one event_type partitioning.
    "e25_max_drawdown" -> ((s, dir) => TimeSeries.maxDrawdown(Tables.events(s, dir))),
    // RSI over hourly closes in integer permille (Cutler's simple form —
    // the hash-pinnable one); warm-up and flat windows report null.
    "e26_rsi" -> ((s, dir) => TimeSeries.rsiBars(Tables.events(s, dir))),
    // Bullish-engulfing scan: fixed-length sequence pattern as one lag
    // window + row predicate (MATCH_RECOGNIZE-lite), integer cents.
    "e27_engulfing" -> ((s, dir) => TimeSeries.engulfingBars(Tables.events(s, dir))),
    // CDC changelog apply: per-key max_by compaction (last op wins, D
    // deletes) + ONE full-outer merge into the base snapshot.
    "e21_cdc_apply" -> ((s, dir) =>
      MergeOps.cdcApplyDemo(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Incremental join-view maintenance: ΔL⋈O₀ ∪ L₀⋈ΔO ∪ ΔL⋈ΔO added to
    // the stored view equals the full recompute — TRUE-boolean contract.
    "e22_join_maintenance" -> ((s, dir) =>
      MergeOps.joinMaintenanceDemo(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Interval-overlap join: sessions × anomalous hours via broadcast
    // nested-loop (incident side is metadata-scale) — the third point on
    // the non-equi strategy surface next to j7 range and j12 binning.
    "e23_session_incidents" -> ((s, dir) =>
      Sessions.sessionIncidentOverlap(Tables.events(s, dir))),
    // Golden-record attribute survivorship: per-attribute latest non-null
    // with provenance, composed from different events per column.
    "e28_golden_record" -> ((s, dir) =>
      MergeOps.goldenRecord(Tables.events(s, dir))),
    // Seasonal-naive backtest: hour-vs-same-hour-yesterday forecast error
    // per event_type over the calendar-joined hourly grid.
    "e29_seasonal_backtest" -> ((s, dir) =>
      TimeSeries.seasonalBacktest(Tables.events(s, dir))),
    // Incremental sessionization across a time cut with carried open-
    // session state; the one-shot e6 SQL is the oracle, so the hash gate
    // proves incremental == full recompute.
    "e30_incremental_sessions" -> ((s, dir) =>
      Sessions.incrementalSessionize(Tables.events(s, dir))),
    // Integer-exact CUSUM changepoint per series: argmax |n·S_i − i·S_n|
    // over hourly totals, before/after sums as exact rationals.
    "e31_cusum_changepoint" -> ((s, dir) =>
      TimeSeries.cusumChangepoint(Tables.events(s, dir))),
    // Bollinger ±2σ breakouts decided by integer cross-multiplication.
    "e32_bollinger" -> ((s, dir) =>
      TimeSeries.bollingerBreakouts(Tables.events(s, dir))),
    // Hourly VWAP with the JSON `k` field as volume.
    "e33_vwap" -> ((s, dir) => TimeSeries.vwapBars(Tables.events(s, dir))),
    // Duration-weighted TWAP per series over irregular event spacing.
    "e34_twap" -> ((s, dir) => TimeSeries.twap(Tables.events(s, dir))),
    // Spark 4 VARIANT path: parse_json once, typed variant_get per field.
    "e35_variant_extract" -> ((s, dir) =>
      TextOps.variantExtract(Tables.events(s, dir))),
    // Inter-arrival burstiness: log2-second buckets via binary digit count.
    "e36_interarrival_hist" -> ((s, dir) =>
      TimeSeries.interarrivalHistogram(Tables.events(s, dir))),
    // Strict local maxima/minima per series over hourly close bars.
    "e37_peaks" -> ((s, dir) =>
      TimeSeries.peakDetection(Tables.events(s, dir))),
    // Hour-of-day seasonality fingerprint per series (pure µs arithmetic).
    "e38_diurnal_profile" -> ((s, dir) =>
      TimeSeries.diurnalProfile(Tables.events(s, dir))),
    // Lifetime-span histogram in weeks with activity density.
    "e39_tenure_hist" -> ((s, dir) =>
      TimeSeries.tenureHistogram(Tables.events(s, dir))),
    // First-view -> first-purchase latency histogram (log2 buckets).
    "e40_conversion_lag" -> ((s, dir) =>
      TimeSeries.conversionLag(Tables.events(s, dir))),
    // Delete-aware incremental aggregate maintenance: group state
    // retracts for free, extrema detect when they must rescan.
    "e41_retractable_agg" -> ((s, dir) =>
      Quality.retractableAggContract(Tables.events(s, dir))),
    // Valid-time x transaction-time resolution with retro corrections:
    // what we knew at D vs what we know now, per priority class.
    "e42_bitemporal" -> ((s, dir) =>
      MergeOps.bitemporalAsOf(Tables.orders(s, dir))),
    // MATCH_RECOGNIZE-lite (PATTERN V C* P) via event-string
    // projection and non-overlapping greedy regex.
    "e43_pattern_match" -> ((s, dir) =>
      Sessions.patternMatch(Tables.events(s, dir))),
    // Closed-form integer business-day SLA lag histogram.
    "e44_busday_lag" -> ((s, dir) =>
      TimeSeries.busdayLag(Tables.orders(s, dir), Tables.lineitem(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    "e9_correlated_sql" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  AND EXISTS (SELECT 1 FROM orders o3
        |              WHERE o3.o_custkey = o.o_custkey
        |                AND o3.o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    "e10_tumbling_window" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start_s,
        |         event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT window_start_s, event_type, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY window_start_s, event_type
        |ORDER BY window_start_s, event_type""".stripMargin,
    "e1_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k,
        | CAST(props->>'$.k' AS INT) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,
    "e2_scd2_merge" ->
      (scd2MergedCte +
        "\nSELECT * FROM merged ORDER BY c_custkey, valid_from"),
    "e11_pit_lookup" ->
      (scd2MergedCte + """
        |, t0 AS (
        |  SELECT c_custkey, c_mktsegment FROM merged
        |  WHERE valid_from <= 0 AND (valid_to IS NULL OR valid_to > 0)
        |), t1 AS (
        |  SELECT c_custkey, c_mktsegment FROM merged
        |  WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)
        |)
        |SELECT o.o_orderkey, o.o_custkey,
        |       t0.c_mktsegment AS seg_t0, t1.c_mktsegment AS seg_t1,
        |       t0.c_mktsegment IS DISTINCT FROM t1.c_mktsegment AS segment_changed
        |FROM orders o
        |LEFT JOIN t0 ON o.o_custkey = t0.c_custkey
        |LEFT JOIN t1 ON o.o_custkey = t1.c_custkey
        |ORDER BY o_orderkey""".stripMargin),
    "e3_latest_per_key" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "e4_incremental_agg" ->
      """SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |       TRUE AS incremental_matches
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e6_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) AS BIGINT) AS end_us,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "e5_sql_front_door" ->
      """SELECT user_id,
        |       EXTRACT(year FROM CAST(ts AS DATE)) AS year,
        |       EXTRACT(month FROM CAST(ts AS DATE)) AS month,
        |       CAST(COUNT(*) AS BIGINT) AS total_registros,
        |       CAST(SUM(event_id) AS BIGINT) AS volume_total,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE value IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND event_id IS NOT NULL
        |GROUP BY user_id, EXTRACT(year FROM CAST(ts AS DATE)),
        |         EXTRACT(month FROM CAST(ts AS DATE))
        |ORDER BY user_id, year, month""".stripMargin,
    "e8_erasure_audit" ->
      """WITH req AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE instr('0123456789abcdef',
        |              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 = 7
        |  UNION ALL SELECT CAST(1000001 AS BIGINT)
        |  UNION ALL SELECT CAST(1000002 AS BIGINT)
        |), hits AS (
        |  SELECT user_id, COUNT(*) AS n FROM events
        |  WHERE user_id IN (SELECT user_id FROM req)
        |  GROUP BY user_id
        |)
        |SELECT r.user_id,
        |       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_rows_removed,
        |       h.n IS NOT NULL AS found
        |FROM req r LEFT JOIN hits h USING (user_id)
        |ORDER BY r.user_id""".stripMargin,
    "e12_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), s0 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
        |              OVER (PARTITION BY user_id) AS t0
        |  FROM e
        |), s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us >= t0
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS t1
        |  FROM s0
        |), s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us >= t1
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS t2
        |  FROM s1
        |), u AS (
        |  SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
        |  FROM s2 GROUP BY user_id
        |), c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM u
        |)
        |SELECT step, step_name, n_users, conv_permille FROM (
        |  SELECT 1 AS step, 'view' AS step_name, n0 AS n_users,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n0 * 1000 // n0 END AS conv_permille
        |  FROM c
        |  UNION ALL
        |  SELECT 2, 'click', n1,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n1 * 1000 // n0 END FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', n2,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n2 * 1000 // n0 END FROM c
        |) ORDER BY step""".stripMargin,
    "e17_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS k
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *,
        |    last_value(CASE WHEN k = 0 THEN event_id END IGNORE NULLS) OVER w
        |      AS last_click_id,
        |    last_value(CASE WHEN k = 0 THEN us END IGNORE NULLS) OVER w
        |      AS last_click_us
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, k, event_id
        |               ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT event_id, user_id, CAST(us AS BIGINT) AS purchase_us,
        |  CASE WHEN last_click_us IS NOT NULL
        |         AND us - last_click_us <= 3600000000
        |       THEN last_click_id END AS click_id,
        |  CASE WHEN last_click_us IS NOT NULL
        |         AND us - last_click_us <= 3600000000
        |       THEN CAST(us - last_click_us AS BIGINT) END AS gap_us
        |FROM m WHERE k = 1 ORDER BY event_id""".stripMargin,
    "e13_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |         (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS week
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), coh AS (
        |  SELECT user_id, week,
        |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM act
        |), cell AS (
        |  SELECT cohort_week, week - cohort_week AS week_offset,
        |         CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM coh GROUP BY 1, 2
        |), sized AS (
        |  SELECT *, MAX(CASE WHEN week_offset = 0 THEN n_active END)
        |              OVER (PARTITION BY cohort_week) AS cohort_size
        |  FROM cell
        |)
        |SELECT cohort_week, week_offset, n_active,
        |       CAST(cohort_size AS BIGINT) AS cohort_size,
        |       CAST(n_active * 1000 // cohort_size AS BIGINT)
        |         AS retention_permille
        |FROM sized ORDER BY cohort_week, week_offset""".stripMargin,
    "e14_sliding_window" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, user_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL
        |), w AS (
        |  SELECT (us // 600000000) * 600000000 - i * 600000000
        |           AS window_start_us,
        |         user_id, event_type, cents
        |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) sl
        |)
        |SELECT window_start_us, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e15_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 3600000000 THEN 1
        |            ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY us
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f
        |)
        |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) + 3600000000 AS BIGINT) AS end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "e8b_erasure_propagation" ->
      """SELECT TRUE AS erasure_nonempty, TRUE AS bands_nonempty,
        |       TRUE AS bands_equal, TRUE AS bands_clean,
        |       TRUE AS sigs_equal, TRUE AS ivf_nonempty,
        |       TRUE AS ivf_equal, TRUE AS ivf_clean""".stripMargin,
    "e16_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), l AS (
        |  SELECT event_type AS next_type, us,
        |         lag(event_type) OVER w AS prev_type,
        |         lag(us) OVER w AS prev_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), c AS (
        |  SELECT prev_type, next_type,
        |         CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |         CAST(SUM(us - prev_us) AS BIGINT) AS sum_gap_us
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT prev_type, next_type, n_transitions,
        |       CAST(n_transitions * 10000 //
        |            SUM(n_transitions) OVER (PARTITION BY prev_type)
        |         AS BIGINT) AS share_bp,
        |       CAST(sum_gap_us // n_transitions AS BIGINT) AS avg_gap_us
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "e7_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM orders
        |), o AS (
        |  SELECT o_orderkey, o_orderstatus AS old_o_orderstatus, cents AS old_cents
        |  FROM base WHERE nb <= 11
        |), n AS (
        |  SELECT o_orderkey, o_orderstatus AS new_o_orderstatus,
        |         CASE WHEN nb IN (4, 5) THEN cents + 100 ELSE cents END AS new_cents
        |  FROM base WHERE nb >= 2
        |), j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |         old_o_orderstatus, new_o_orderstatus, old_cents, new_cents,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
        |                   OR old_cents IS DISTINCT FROM new_cents THEN 'changed'
        |         END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |)
        |SELECT o_orderkey, change_type,
        |       old_o_orderstatus, new_o_orderstatus, old_cents, new_cents
        |FROM j WHERE change_type IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "e45_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), m AS (SELECT SUM(x) // COUNT(*) AS mu FROM daily),
        |dev AS (SELECT day, x - mu AS d FROM daily CROSS JOIN m),
        |den AS (SELECT SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS den
        |        FROM dev),
        |k AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag)
        |SELECT k.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(CAST(a.d AS HUGEINT) * CAST(b.d AS HUGEINT)) * 1000
        |            // NULLIF(MAX(den.den), 0) AS BIGINT) AS rho_permille,
        |       CAST(SUM(CAST(a.d AS HUGEINT) * CAST(b.d AS HUGEINT)) * 1000000
        |            // NULLIF(MAX(den.den), 0) AS BIGINT) AS rho_ppm
        |FROM dev a JOIN k ON TRUE JOIN dev b ON b.day = a.day + k.lag
        |CROSS JOIN den
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e46_period_over_period" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
        |           AS mk,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT m.mk // 12 AS yr, m.mk % 12 + 1 AS mo, m.cents,
        |       p.cents AS prev_cents, y.cents AS yoy_cents,
        |       CAST((m.cents - p.cents) * 1000 // p.cents AS BIGINT)
        |         AS mom_permille,
        |       CAST((m.cents - y.cents) * 1000 // y.cents AS BIGINT)
        |         AS yoy_permille
        |FROM monthly m
        |LEFT JOIN monthly p ON p.mk = m.mk - 1
        |LEFT JOIN monthly y ON y.mk = m.mk - 12
        |ORDER BY 1, 2""".stripMargin,
    "e47_ewma" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), k AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS i)
        |SELECT a.day, a.x, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(b.x * (CAST(1 AS BIGINT) << CAST(9 - k.i AS INT)))
        |       AS BIGINT) AS ewma_num,
        |  CAST(SUM(CAST(1 AS BIGINT) << CAST(9 - k.i AS INT)) AS BIGINT)
        |    AS wt_den
        |FROM daily a JOIN k ON TRUE JOIN daily b ON b.day = a.day - k.i
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "e48_kaplan_meier" ->
      """WITH pc AS (
        |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
        |         MAX(CAST(o_orderdate AS DATE)) AS last_d
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        |), h AS (
        |  SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders
        |), obs AS (
        |  SELECT CAST(last_d - first_d AS BIGINT) AS t,
        |         CASE WHEN max_d - last_d > 365 THEN 1 ELSE 0 END AS churned
        |  FROM pc CROSS JOIN h
        |), byt AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at_t,
        |         CAST(SUM(churned) AS BIGINT) AS d_events
        |  FROM obs GROUP BY 1
        |)
        |SELECT t,
        |  CAST(SUM(n_at_t) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_risk,
        |  d_events, n_at_t - d_events AS n_censored_at_t
        |FROM byt QUALIFY d_events > 0 ORDER BY t""".stripMargin,
    "e49_linear_interp" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), spine AS (
        |  SELECT CAST(unnest(range(MIN(day), MAX(day) + 1)) AS BIGINT) AS day
        |  FROM daily
        |), j AS (
        |  SELECT s.day, d.x,
        |    LAST_VALUE(CASE WHEN d.x IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
        |    LAST_VALUE(d.x IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS x_p,
        |    FIRST_VALUE(CASE WHEN d.x IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS q,
        |    FIRST_VALUE(d.x IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS x_q
        |  FROM spine s LEFT JOIN daily d USING (day)
        |)
        |SELECT day, p, q,
        |  CAST(x_p * (q - day) + x_q * (day - p) AS BIGINT) AS interp_num,
        |  CAST(q - p AS BIGINT) AS gap_den
        |FROM j
        |WHERE x IS NULL AND p IS NOT NULL AND q IS NOT NULL
        |ORDER BY day""".stripMargin,
    "e50_decay_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS pus,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type = 'purchase' AND value IS NOT NULL
        |), t AS (
        |  SELECT user_id, event_id AS t_id, epoch_us(ts) AS tus,
        |         event_type AS t_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('click', 'view')
        |), j AS (
        |  SELECT p.p_id, p.v, t.t_id, t.tus, t.t_type,
        |    (CAST(1 AS BIGINT)
        |     << CAST(2 - (p.pus - t.tus) // 86400000000 AS INT)) AS w
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.tus < p.pus AND p.pus - t.tus < 3 * 86400000000
        |), c AS (
        |  SELECT t_type,
        |    v * w // SUM(w) OVER (PARTITION BY p_id)
        |      + CASE WHEN row_number() OVER (PARTITION BY p_id
        |                                     ORDER BY tus DESC, t_id DESC) = 1
        |             THEN v - SUM(v * w // wtot) OVER (PARTITION BY p_id)
        |             ELSE 0 END AS credit
        |  FROM (SELECT *, SUM(w) OVER (PARTITION BY p_id) AS wtot FROM j)
        |), u AS (
        |  SELECT 'unattributed' AS t_type, v AS credit
        |  FROM p WHERE p_id NOT IN (SELECT p_id FROM j)
        |), allc AS (SELECT * FROM c UNION ALL SELECT * FROM u)
        |SELECT t_type, CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(credit) AS BIGINT) AS credited_cents
        |FROM allc GROUP BY 1 ORDER BY 1""".stripMargin,
    "e51_ltv_triangle" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_totalprice IS NOT NULL
        |), f AS (SELECT o_custkey, MIN(day) AS d0 FROM o GROUP BY 1),
        |sz AS (
        |  SELECT d0 // 7 AS cohort_wk, CAST(COUNT(*) AS BIGINT)
        |    AS cohort_size
        |  FROM f GROUP BY 1
        |), cells AS (
        |  SELECT f.d0 // 7 AS cohort_wk, (o.day - f.d0) // 7 AS weeks_since,
        |    CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |    CAST(SUM(o.cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN f USING (o_custkey)
        |  WHERE (o.day - f.d0) // 7 < 12
        |  GROUP BY 1, 2
        |), c2 AS (
        |  SELECT cohort_wk, weeks_since, n_active, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_wk
        |      ORDER BY weeks_since
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_rev_cents
        |  FROM cells
        |)
        |SELECT c2.cohort_wk, weeks_since, n_active, rev_cents,
        |  cum_rev_cents, cohort_size,
        |  cum_rev_cents // cohort_size AS ltv_cents
        |FROM c2 JOIN sz ON c2.cohort_wk = sz.cohort_wk
        |ORDER BY 1, 2""".stripMargin,
    "e53_rev_recognition" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), k AS (SELECT CAST(unnest(range(0, 30)) AS BIGINT) AS i)
        |SELECT d.day + k.i AS rec_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_source_days,
        |  CAST(SUM(CASE WHEN k.i < 29 THEN d.v // 30
        |                ELSE d.v - 29 * (d.v // 30) END) AS BIGINT)
        |    AS recognized_cents
        |FROM daily d JOIN k ON TRUE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e54_daily_percentiles" ->
      """WITH counts AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT day, cents,
        |    SUM(cnt) OVER (PARTITION BY day ORDER BY cents) AS cum,
        |    SUM(cnt) OVER (PARTITION BY day) AS n
        |  FROM counts
        |)
        |SELECT day, CAST(MAX(n) AS BIGINT) AS n_events,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 50 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 90 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p90_cents,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 99 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p99_cents
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,
    "e55_open_orders" ->
      """WITH shipped AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT))
        |      AS last_ship
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
        |), spans AS (
        |  SELECT o.o_orderkey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS opened,
        |    s.last_ship
        |  FROM orders o JOIN shipped s USING (o_orderkey)
        |  WHERE o.o_orderdate IS NOT NULL
        |), deltas AS (
        |  SELECT day, CAST(SUM(od) AS BIGINT) AS n_opened,
        |         CAST(SUM(cd) AS BIGINT) AS n_closed
        |  FROM (
        |    SELECT opened AS day, 1 AS od, 0 AS cd FROM spans
        |    UNION ALL
        |    SELECT last_ship + 1 AS day, 0 AS od, 1 AS cd FROM spans
        |  ) GROUP BY 1
        |)
        |SELECT day, n_opened, n_closed,
        |  CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS open_backlog
        |FROM deltas ORDER BY day""".stripMargin,
    "e56_fiscal_calendar" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |      // 7 AS wk
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND CAST(o_orderdate AS DATE) >= DATE '1992-01-01'
        |), p AS (
        |  SELECT cents, wk // 52 AS fiscal_year,
        |    (wk % 52) // 13 * 3
        |      + CASE WHEN (wk % 52) % 13 < 4 THEN 1
        |             WHEN (wk % 52) % 13 < 8 THEN 2 ELSE 3 END
        |      AS fiscal_period
        |  FROM b
        |)
        |SELECT fiscal_year, fiscal_period,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS rev_cents
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e57_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY 1),
        |cls AS (
        |  SELECT uw.wk,
        |    CASE WHEN uw.wk = f.first_wk THEN 'new'
        |         WHEN p.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS cls
        |  FROM uw
        |  JOIN f USING (user_id)
        |  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.wk = uw.wk - 1
        |), act AS (
        |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_resurrected
        |  FROM cls GROUP BY 1
        |), ch AS (
        |  SELECT a.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM uw a
        |  LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1
        |  WHERE b.user_id IS NULL
        |  GROUP BY 1
        |)
        |SELECT act.wk, n_active, n_new, n_retained, n_resurrected,
        |  COALESCE(ch.n_churned, 0) AS n_churned
        |FROM act LEFT JOIN ch ON ch.wk = act.wk
        |ORDER BY act.wk""".stripMargin,
    "e58_weekday_anova" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), d2 AS (SELECT day % 7 AS dow, x FROM daily),
        |g AS (
        |  SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM d2
        |), gr AS (
        |  SELECT dow, CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu_g,
        |         CAST(COUNT(*) AS BIGINT) AS n_g
        |  FROM d2 GROUP BY 1
        |), sst AS (
        |  SELECT SUM(CAST(x - mu AS HUGEINT) * CAST(x - mu AS HUGEINT)) AS sst,
        |         MAX(n) AS n_days
        |  FROM d2 CROSS JOIN g
        |), ssb AS (
        |  SELECT SUM(CAST(n_g AS HUGEINT) * CAST(mu_g - mu AS HUGEINT)
        |             * CAST(mu_g - mu AS HUGEINT)) AS ssb
        |  FROM gr CROSS JOIN g
        |)
        |SELECT n_days,
        |  CAST(ssb * 1000 // NULLIF(sst, 0) AS BIGINT) AS eta2_permille,
        |  CAST(ssb * 1000000 // NULLIF(sst, 0) AS BIGINT) AS eta2_ppm
        |FROM sst CROSS JOIN ssb""".stripMargin,
    "e59_stickiness" ->
      """WITH base AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), ds AS (
        |  SELECT day // 7 AS wk, CAST(COUNT(*) AS BIGINT) AS dau_sum
        |  FROM base GROUP BY 1
        |), w AS (
        |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM (SELECT DISTINCT user_id, day // 7 AS wk FROM base)
        |  GROUP BY 1
        |)
        |SELECT ds.wk, dau_sum, wau,
        |  dau_sum * 1000 // (7 * wau) AS stickiness_permille
        |FROM ds JOIN w ON ds.wk = w.wk
        |ORDER BY ds.wk""".stripMargin,
    "e52_adoption_curve" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), npd AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users
        |  FROM (SELECT user_id, MIN(day) AS day FROM base GROUP BY 1)
        |  GROUP BY 1
        |), epd AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM base GROUP BY 1
        |)
        |SELECT e.day, e.n_events,
        |  COALESCE(n.n_new_users, 0) AS n_new_users,
        |  CAST(SUM(COALESCE(n.n_new_users, 0)) OVER (ORDER BY e.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM epd e LEFT JOIN npd n ON n.day = e.day
        |ORDER BY e.day""".stripMargin,
    "e18_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), b AS (
        |  SELECT (us // 3600000000) * 3600000000 AS bar_us,
        |         event_type, cents, us, event_id
        |  FROM e
        |), w AS (
        |  SELECT bar_us, event_type, cents,
        |    first_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM b
        |)
        |SELECT bar_us, event_type,
        |       CAST(any_value(o) AS BIGINT) AS open_cents,
        |       CAST(MAX(cents) AS BIGINT) AS high_cents,
        |       CAST(MIN(cents) AS BIGINT) AS low_cents,
        |       CAST(any_value(c) AS BIGINT) AS close_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(cents) AS BIGINT) AS vol_cents
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e19_interval_coverage" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) + 1800000000 AS end_us
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |), m AS (
        |  SELECT user_id, us, end_us,
        |    max(end_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end,
        |    event_id
        |  FROM e
        |), g AS (
        |  SELECT user_id, us, end_us,
        |    SUM(CASE WHEN prev_end IS NULL OR us > prev_end THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m
        |), i AS (
        |  SELECT user_id, island, MIN(us) AS start_us, MAX(end_us) AS fin_us,
        |         COUNT(*) AS n
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |       CAST(SUM(fin_us - start_us) AS BIGINT) AS covered_us,
        |       CAST(MAX(fin_us - start_us) AS BIGINT) AS longest_us,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,
    "e20_trigram_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
        |), s AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e3
        |  FROM e
        |)
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n_paths DESC, e1, e2, e3""".stripMargin,
    "e24_trend_slopes" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
        |), x AS (
        |  SELECT user_id, cents,
        |         (us - min(us) OVER (PARTITION BY user_id)) // 60000000 AS x
        |  FROM e
        |), s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(cents) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(x * cents) AS BIGINT) AS sxy
        |  FROM x GROUP BY user_id
        |)
        |SELECT user_id, n,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN n * sxy - sx * sy END AS slope_num,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN n * sxx - sx * sx END AS slope_den,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN sy * sxx - sx * sxy END AS intercept_num
        |FROM s ORDER BY user_id""".stripMargin,
    "e25_max_drawdown" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), d AS (
        |  SELECT event_type, us,
        |         MAX(cents) OVER w - cents AS dd,
        |         MAX(cents) OVER w AS peak
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), a AS (
        |  SELECT event_type, CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents,
        |         CAST(MAX(peak) AS BIGINT) AS peak_cents,
        |         CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM d GROUP BY event_type
        |)
        |SELECT a.event_type, a.max_drawdown_cents, a.peak_cents, a.n_events,
        |       CAST(MIN(d.us) AS BIGINT) AS trough_us
        |FROM a JOIN d ON d.event_type = a.event_type
        |              AND d.dd = a.max_drawdown_cents
        |GROUP BY 1, 2, 3, 4 ORDER BY a.event_type""".stripMargin,
    "e26_rsi" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), cl AS (
        |  SELECT DISTINCT bar_us, event_type,
        |    last_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS close_cents
        |  FROM e
        |), w AS (
        |  SELECT event_type, bar_us, close_cents,
        |    close_cents - lag(close_cents) OVER
        |      (PARTITION BY event_type ORDER BY bar_us) AS delta
        |  FROM cl
        |), g AS (
        |  SELECT event_type, bar_us, close_cents,
        |    COUNT(delta) OVER f AS n_deltas,
        |    SUM(GREATEST(delta, 0)) OVER f AS gsum,
        |    SUM(GREATEST(-delta, 0)) OVER f AS lsum
        |  FROM w
        |  WINDOW f AS (PARTITION BY event_type ORDER BY bar_us
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, CAST(bar_us AS BIGINT) AS bar_us,
        |       CAST(close_cents AS BIGINT) AS close_cents,
        |       CASE WHEN n_deltas >= 14 AND gsum + lsum > 0
        |            THEN CAST(gsum * 1000 // (gsum + lsum) AS BIGINT)
        |       END AS rsi_permille
        |FROM g ORDER BY event_type, bar_us""".stripMargin,
    "e27_engulfing" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), oc AS (
        |  SELECT DISTINCT bar_us, event_type,
        |    first_value(cents) OVER w AS open_cents,
        |    last_value(cents) OVER w AS close_cents
        |  FROM e
        |  WINDOW w AS (PARTITION BY bar_us, event_type ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), lagged AS (
        |  SELECT event_type, bar_us, open_cents, close_cents,
        |    lag(open_cents) OVER p AS prev_open,
        |    lag(close_cents) OVER p AS prev_close
        |  FROM oc
        |  WINDOW p AS (PARTITION BY event_type ORDER BY bar_us)
        |)
        |SELECT event_type, CAST(bar_us AS BIGINT) AS bar_us,
        |       CAST(prev_open AS BIGINT) AS prev_open,
        |       CAST(prev_close AS BIGINT) AS prev_close,
        |       CAST(open_cents AS BIGINT) AS open_cents,
        |       CAST(close_cents AS BIGINT) AS close_cents
        |FROM lagged
        |WHERE prev_close < prev_open AND close_cents > open_cents
        |  AND open_cents <= prev_close AND close_cents >= prev_open
        |ORDER BY event_type, bar_us""".stripMargin,
    "e21_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS key,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS base_cents
        |  FROM orders
        |  WHERE instr('0123456789abcdef',
        |              substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 < 12
        |), chg AS (
        |  SELECT l_orderkey AS key, l_linenumber AS seq,
        |         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), comp AS (
        |  SELECT key, op, cents AS chg_cents FROM (
        |    SELECT key, op, cents,
        |      row_number() OVER (PARTITION BY key
        |        ORDER BY seq DESC, op DESC, cents DESC) AS rn
        |    FROM chg) WHERE rn = 1
        |)
        |SELECT COALESCE(b.key, c.key) AS key,
        |       CAST(COALESCE(c.chg_cents, b.base_cents) AS BIGINT) AS cents,
        |       CASE WHEN c.key IS NULL THEN 'base'
        |            WHEN b.key IS NULL THEN 'insert'
        |            ELSE 'update' END AS src
        |FROM base b FULL OUTER JOIN comp c ON b.key = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY key""".stripMargin,
    "e22_join_maintenance" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM orders
        |), l AS (
        |  SELECT l_orderkey,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), j AS (
        |  SELECT o_orderstatus, cents,
        |         CASE WHEN l_orderkey % 7 = 0 THEN 1 ELSE 0 END AS is_dl,
        |         CASE WHEN nb >= 12 THEN 1 ELSE 0 END AS is_do
        |  FROM l JOIN o ON l_orderkey = o_orderkey
        |), terms AS (
        |  SELECT o_orderstatus, SUM(cents) AS c, COUNT(*) AS n
        |  FROM j WHERE is_dl = 0 AND is_do = 0 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 1 AND is_do = 0 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 0 AND is_do = 1 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 1 AND is_do = 1 GROUP BY 1
        |), m AS (
        |  SELECT o_orderstatus, CAST(SUM(c) AS BIGINT) AS maintained_cents,
        |         CAST(SUM(n) AS BIGINT) AS maintained_rows
        |  FROM terms GROUP BY 1
        |), f AS (
        |  SELECT o_orderstatus, CAST(SUM(cents) AS BIGINT) AS full_cents,
        |         CAST(COUNT(*) AS BIGINT) AS full_rows
        |  FROM j GROUP BY 1
        |)
        |SELECT f.o_orderstatus, full_cents, maintained_cents,
        |       full_rows, maintained_rows,
        |       full_cents IS NOT DISTINCT FROM maintained_cents AS cents_agree,
        |       full_rows IS NOT DISTINCT FROM maintained_rows AS rows_agree
        |FROM f FULL OUTER JOIN m USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
    "e23_session_incidents" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |), sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |         MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY 1, 2
        |), b AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us,
        |         COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2
        |), inc AS (
        |  SELECT event_type AS inc_type, bar_us FROM (
        |    SELECT *, SUM(n) OVER (PARTITION BY event_type) //
        |              COUNT(n) OVER (PARTITION BY event_type) AS target
        |    FROM b)
        |  WHERE n * 4 >= target * 5 + 4
        |)
        |SELECT sess.user_id, sess.session_id,
        |       CAST(sess.start_us AS BIGINT) AS start_us,
        |       CAST(sess.end_us AS BIGINT) AS end_us,
        |       CAST(COUNT(inc.bar_us) AS BIGINT) AS n_incident_hours,
        |       CAST(COUNT(DISTINCT inc.inc_type) AS BIGINT) AS n_incident_types
        |FROM sess LEFT JOIN inc
        |  ON sess.start_us < inc.bar_us + 3600000000
        | AND inc.bar_us <= sess.end_us
        |GROUP BY 1, 2, 3, 4
        |ORDER BY user_id, session_id""".stripMargin,
    "e28_golden_record" ->
      """WITH b AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |         CASE WHEN event_type = 'purchase'
        |              THEN CAST(round(value * 100) AS BIGINT) END AS value_cents,
        |         CASE WHEN event_type = 'click'
        |              THEN CAST(props->>'$.k' AS BIGINT) END AS k
        |  FROM events WHERE user_id IS NOT NULL
        |), w AS (
        |  SELECT user_id,
        |    last_value(event_type IGNORE NULLS) OVER wu AS last_event_type,
        |    last_value(CASE WHEN event_type IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_event_type_us,
        |    last_value(value_cents IGNORE NULLS) OVER wu AS last_purchase_cents,
        |    last_value(CASE WHEN value_cents IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_purchase_us,
        |    last_value(k IGNORE NULLS) OVER wu AS last_click_k,
        |    last_value(CASE WHEN k IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_click_us
        |  FROM b
        |  WINDOW wu AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MAX(last_event_type) AS last_event_type,
        |       CAST(MAX(last_event_type_us) AS BIGINT) AS last_event_type_us,
        |       CAST(MAX(last_purchase_cents) AS BIGINT) AS last_purchase_cents,
        |       CAST(MAX(last_purchase_us) AS BIGINT) AS last_purchase_us,
        |       CAST(MAX(last_click_k) AS BIGINT) AS last_click_k,
        |       CAST(MAX(last_click_us) AS BIGINT) AS last_click_us
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e29_seasonal_backtest" ->
      """WITH grid AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us,
        |         COUNT(*) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), j AS (
        |  SELECT g.event_type, g.bar_us, g.cnt, b.cnt AS base_cnt
        |  FROM grid g LEFT JOIN grid b
        |    ON b.event_type = g.event_type
        |   AND b.bar_us = g.bar_us - 86400000000
        |  WHERE g.bar_us >= (SELECT MIN(bar_us) FROM grid) + 86400000000
        |)
        |SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       CAST(SUM(CASE WHEN base_cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_missing_base,
        |       CAST(SUM(CASE WHEN base_cnt IS NOT NULL
        |                     THEN abs(cnt - base_cnt) END) AS BIGINT)
        |         AS abs_err_sum,
        |       CAST(SUM(CASE WHEN base_cnt IS NOT NULL
        |                     THEN cnt - base_cnt END) AS BIGINT) AS bias_sum,
        |       CAST(MAX(CASE WHEN base_cnt IS NOT NULL
        |                     THEN abs(cnt - base_cnt) END) AS BIGINT)
        |         AS worst_abs_err
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e30's oracle is the ONE-SHOT sessionization (same SQL as e6): the
    // incremental path must reproduce it bit for bit.
    "e30_incremental_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) AS BIGINT) AS end_us,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "e31_cusum_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS hour_cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT event_type, bar,
        |    CAST(SUM(hour_cents) OVER
        |      (PARTITION BY event_type ORDER BY bar) AS BIGINT) AS s_i,
        |    CAST(ROW_NUMBER() OVER
        |      (PARTITION BY event_type ORDER BY bar) AS BIGINT) AS i,
        |    CAST(SUM(hour_cents) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS s_n,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hourly
        |), d AS (
        |  SELECT *, n * s_i - i * s_n AS d FROM scored WHERE i < n
        |)
        |SELECT event_type, n AS n_hours,
        |       bar * 3600000000 AS changepoint_us,
        |       abs(d) AS max_abs_d, s_i AS sum_before, i AS n_before,
        |       s_n - s_i AS sum_after, n - i AS n_after
        |FROM d
        |QUALIFY ROW_NUMBER() OVER
        |  (PARTITION BY event_type ORDER BY abs(d) DESC, bar) = 1
        |ORDER BY event_type""".stripMargin,
    "e32_bollinger" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) // 3600000000 AS bar,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, bar,
        |         arg_max(cents, CAST(us AS HUGEINT) * 1000000 + event_id)
        |           AS close
        |  FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, close,
        |         COUNT(*) OVER w AS n, SUM(close) OVER w AS s,
        |         SUM(close * close) OVER w AS q
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bar
        |                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  CAST(SUM(CASE WHEN (n*close - s) > 0
        |        AND (n*close - s) * (n*close - s) > 4 * (n*q - s*s)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(SUM(CASE WHEN (n*close - s) < 0
        |        AND (n*close - s) * (n*close - s) > 4 * (n*q - s*s)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM s WHERE n = 20 GROUP BY 1 ORDER BY 1""".stripMargin,
    "e33_vwap" ->
      """WITH e AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 3600000000 * 3600000000 AS bar_us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         CAST(json_extract_string(props, 'k') AS BIGINT) AS vol
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT bar_us, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(vol) AS BIGINT) AS volume,
        |       CAST(SUM(cents * vol) AS BIGINT) AS notional_cents,
        |       CASE WHEN SUM(vol) > 0
        |            THEN CAST(SUM(cents * vol) // SUM(vol) AS BIGINT) END
        |         AS vwap_cents
        |FROM e WHERE vol IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e34_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), l AS (
        |  SELECT event_type, cents,
        |         lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |           - us AS dur_us
        |  FROM e
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |       CAST(SUM(dur_us) AS BIGINT) AS span_us,
        |       CAST(SUM(cents * dur_us) AS BIGINT) AS weighted_cents,
        |       CAST(SUM(cents * dur_us) // SUM(dur_us) AS BIGINT) AS twap_cents
        |FROM l WHERE dur_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e35_variant_extract" ->
      """SELECT event_type,
        |  CAST(COUNT(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_with_k,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e36_interarrival_hist" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |), g AS (
        |  SELECT event_type,
        |    (us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id))
        |      // 1000000 AS gap_s
        |  FROM e
        |), b AS (
        |  SELECT event_type, gap_s,
        |    CASE WHEN gap_s <= 0 THEN 0
        |         ELSE CAST(length(printf('%b', gap_s)) AS BIGINT) END AS bucket
        |  FROM g WHERE gap_s IS NOT NULL
        |)
        |SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
        |  CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
        |  CAST(CASE WHEN bucket = 0 THEN 0
        |       ELSE 1 << (bucket - 1) END AS BIGINT) AS lo_s,
        |  CAST(CASE WHEN bucket = 0 THEN 0
        |       ELSE (1 << bucket) - 1 END AS BIGINT) AS hi_s
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e37_peaks" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) // 3600000000 AS bar,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, bar,
        |         arg_max(cents, CAST(us AS HUGEINT) * 1000000 + event_id)
        |           AS close
        |  FROM e GROUP BY 1, 2
        |), n AS (
        |  SELECT event_type, bar, close,
        |    lag(close) OVER w AS prev, lead(close) OVER w AS next
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bar)
        |), f AS (
        |  SELECT event_type, bar, close,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL
        |          AND close > prev AND close > next THEN 1 ELSE 0 END AS is_peak,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL
        |          AND close < prev AND close < next THEN 1 ELSE 0 END AS is_trough,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL THEN 1 ELSE 0 END
        |      AS decidable
        |  FROM n
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bars,
        |  CAST(SUM(decidable) AS BIGINT) AS n_decidable,
        |  CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
        |  CAST(SUM(is_trough) AS BIGINT) AS n_troughs,
        |  CAST(MAX(CASE WHEN is_peak = 1 THEN close END) AS BIGINT)
        |    AS highest_peak_cents,
        |  CAST(arg_max(bar, CASE WHEN is_peak = 1
        |       THEN close * 10000000 + bar END) AS BIGINT) AS highest_peak_bar
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "e38_diurnal_profile" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM e GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total_events,
        |         CAST(SUM(cents) AS BIGINT) AS total_cents
        |  FROM h GROUP BY 1
        |)
        |SELECT h.event_type, h.hour_of_day, h.n_events, h.cents,
        |  CAST(h.n_events * 10000 // t.total_events AS BIGINT)
        |    AS event_share_bp,
        |  CAST(h.cents * 10000 // t.total_cents AS BIGINT) AS value_share_bp
        |FROM h JOIN t USING (event_type)
        |ORDER BY event_type, hour_of_day""".stripMargin,
    "e39_tenure_hist" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |), pu AS (
        |  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day,
        |         CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(day) - MIN(day) + 1 AS span_days
        |  FROM d GROUP BY 1
        |)
        |SELECT CAST((span_days - 1) // 7 AS BIGINT) AS week_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(SUM(n_active_days) AS BIGINT) AS active_days,
        |       CAST(SUM(n_active_days) * 1000 // SUM(span_days) AS BIGINT)
        |         AS density_permille
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,
    "e40_conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IN ('view', 'purchase')
        |), f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN us END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase' THEN us END) AS first_purchase
        |  FROM e GROUP BY 1
        |), l AS (
        |  SELECT user_id, first_view, first_purchase,
        |    CASE WHEN first_purchase >= first_view
        |         THEN (first_purchase - first_view) // 1000000 END AS lag_s
        |  FROM f WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |), b AS (
        |  SELECT CASE WHEN first_purchase < first_view THEN -1
        |         WHEN lag_s <= 0 THEN 0
        |         ELSE CAST(length(printf('%b', lag_s)) AS BIGINT) END AS bucket,
        |         lag_s
        |  FROM l
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(MIN(lag_s) AS BIGINT) AS min_lag_s,
        |       CAST(MAX(lag_s) AS BIGINT) AS max_lag_s
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "e41_retractable_agg" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |    strpos('0123456789abcdef',
        |           substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1 AS n1,
        |    strpos('0123456789abcdef',
        |           substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1 AS n2
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), b AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS b_cnt,
        |    CAST(SUM(cents) AS BIGINT) AS b_sum,
        |    MIN(cents) AS b_min, MAX(cents) AS b_max
        |  FROM e WHERE n1 < 12 GROUP BY 1
        |), d AS (
        |  SELECT event_type,
        |    CAST(SUM(w) AS BIGINT) AS d_cnt,
        |    CAST(SUM(w * cents) AS BIGINT) AS d_sum,
        |    MIN(CASE WHEN w = 1 THEN cents END) AS ins_min,
        |    MAX(CASE WHEN w = 1 THEN cents END) AS ins_max,
        |    MIN(CASE WHEN w = -1 THEN cents END) AS del_min,
        |    MAX(CASE WHEN w = -1 THEN cents END) AS del_max
        |  FROM (
        |    SELECT event_type, cents, 1 AS w FROM e WHERE n1 >= 12
        |    UNION ALL
        |    SELECT event_type, cents, -1 AS w FROM e WHERE n1 < 12 AND n2 >= 12
        |  ) GROUP BY 1
        |), t AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_cnt,
        |    CAST(SUM(cents) AS BIGINT) AS t_sum,
        |    MIN(cents) AS t_min, MAX(cents) AS t_max
        |  FROM e WHERE (n1 < 12 AND n2 < 12) OR n1 >= 12 GROUP BY 1
        |)
        |SELECT event_type,
        |  CAST(COALESCE(b_cnt, 0) + COALESCE(d_cnt, 0) AS BIGINT) AS cnt,
        |  CAST(COALESCE(b_sum, 0) + COALESCE(d_sum, 0) AS BIGINT)
        |    AS total_cents,
        |  CAST(t_min AS BIGINT) AS min_cents, CAST(t_max AS BIGINT) AS max_cents,
        |  (del_min IS NOT NULL AND del_min <= b_min) AS rescan_min,
        |  (del_max IS NOT NULL AND del_max >= b_max) AS rescan_max,
        |  ((COALESCE(b_cnt, 0) + COALESCE(d_cnt, 0)) = t_cnt
        |   AND (COALESCE(b_sum, 0) + COALESCE(d_sum, 0)) = t_sum
        |   AND ((del_min IS NOT NULL AND del_min <= b_min) OR
        |        (CASE WHEN b_min IS NULL THEN ins_min
        |              WHEN ins_min IS NULL THEN b_min
        |              ELSE least(b_min, ins_min) END) = t_min)
        |   AND ((del_max IS NOT NULL AND del_max >= b_max) OR
        |        (CASE WHEN b_max IS NULL THEN ins_max
        |              WHEN ins_max IS NULL THEN b_max
        |              ELSE greatest(b_max, ins_max) END) = t_max)) AS matches
        |FROM b
        |FULL OUTER JOIN d USING (event_type)
        |FULL OUTER JOIN t USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "e42_bitemporal" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS pr,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d0,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    strpos('0123456789abcdef',
        |      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS n1,
        |    strpos('0123456789abcdef',
        |      substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1 AS n2
        |  FROM orders
        |), a AS (
        |  SELECT k, pr, d0 AS txn, d0 AS vd, cents FROM o
        |  UNION ALL
        |  SELECT k, pr, d0 + 10, d0 - 5, cents + 500 FROM o WHERE n1 < 4
        |  UNION ALL
        |  SELECT k, pr, d0 + 20, d0, CAST(0 AS BIGINT) FROM o WHERE n2 < 2
        |), perkey AS (
        |  SELECT k, pr,
        |    arg_max(cents, txn)
        |      FILTER (WHERE txn <= (DATE '1995-06-01' - DATE '1970-01-01')
        |              AND vd <= (DATE '1995-06-01' - DATE '1970-01-01'))
        |      AS c_asof,
        |    COUNT(*) FILTER (
        |      WHERE txn <= (DATE '1995-06-01' - DATE '1970-01-01')
        |        AND vd <= (DATE '1995-06-01' - DATE '1970-01-01')) AS n_asof,
        |    arg_max(cents, txn)
        |      FILTER (WHERE vd <= (DATE '1995-06-01' - DATE '1970-01-01'))
        |      AS c_fin,
        |    COUNT(*) FILTER (
        |      WHERE vd <= (DATE '1995-06-01' - DATE '1970-01-01')) AS n_fin
        |  FROM a GROUP BY 1, 2
        |)
        |SELECT pr AS o_orderpriority,
        |  CAST(COUNT(CASE WHEN n_asof > 0 THEN 1 END) AS BIGINT) AS n_known,
        |  CAST(SUM(CASE WHEN n_asof > 0 THEN c_asof END) AS BIGINT)
        |    AS cents_known,
        |  CAST(COUNT(CASE WHEN n_fin > 0 THEN 1 END) AS BIGINT) AS n_final,
        |  CAST(SUM(CASE WHEN n_fin > 0 THEN c_fin END) AS BIGINT)
        |    AS cents_final,
        |  CAST(COUNT(CASE WHEN n_asof > 0 AND n_fin > 0
        |                  AND c_asof <> c_fin THEN 1 END) AS BIGINT)
        |    AS n_revised
        |FROM perkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "e43_pattern_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS str
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(str, 'vc*p')) AS BIGINT) AS n_paths,
        |  CAST(len(regexp_extract_all(str, 'vc+p')) AS BIGINT) AS n_assisted,
        |  CAST(COALESCE(list_max(list_transform(
        |    regexp_extract_all(str, 'vc*p'), m -> len(m) - 2)), 0) AS BIGINT)
        |    AS max_clicks_in_path
        |FROM s ORDER BY user_id""".stripMargin,
    "e44_busday_lag" ->
      """WITH fs AS (
        |  SELECT l_orderkey,
        |    CAST(MIN(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS ship_day
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
        |), j AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS order_day,
        |    ship_day
        |  FROM orders JOIN fs ON o_orderkey = l_orderkey
        |), lagged AS (
        |  SELECT o_orderpriority,
        |    (5 * (ship_day // 7) + ([0, 1, 2, 2, 2, 3, 4])[(ship_day % 7) + 1])
        |    - (5 * (order_day // 7) + ([0, 1, 2, 2, 2, 3, 4])[(order_day % 7) + 1])
        |      AS busdays
        |  FROM j
        |)
        |SELECT o_orderpriority, CAST(busdays AS BIGINT) AS busdays,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
