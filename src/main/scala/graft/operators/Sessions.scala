package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: carve each user's event stream into sessions
  * separated by inactivity gaps, then aggregate per session.
  *
  * This is the batch analog of the streaming `session_window`
  * ([[graft.streaming.EventStream]]) and the canonical event-analytics
  * operator the reference's event-driven design implies
  * (`/root/reference/ADR-001-Pipeline-Terraform.txt` event flow;
  * `glue_starter_lambda_function.py:5-35` S3-event trigger) but never
  * gets to express in pandas.
  *
  * Shape: one window partition per user computes the inactivity flag
  * (`lag`) and the running session counter (`sum` over an unbounded
  * preceding frame) — both share the same partitioning AND ordering, so
  * Catalyst plans them over a single Exchange. The session aggregation
  * then re-groups by (user, session).
  *
  * Scale notes:
  *  - The per-user window is the standard sessionize plan at any scale;
  *    the shuffle key is `user_id`, so skew = the hottest user's event
  *    count. At 100 TB, a pathological single user is bounded by
  *    splitting on a coarse time bucket first (sessions never span
  *    buckets longer than the max plausible session) — not needed at
  *    fixture scale and omitted for plan clarity.
  *  - Ordering is (ts, event_id): the monotone id breaks sub-microsecond
  *    timestamp ties deterministically, and session BOUNDARIES are
  *    tie-order-insensitive anyway (equal timestamps ⇒ gap 0 ⇒ never a
  *    boundary).
  *  - Money is aggregated in exact integer cents (engine-independent);
  *    session endpoints are emitted as epoch microseconds (BIGINT), the
  *    same integer DuckDB's `epoch_us` produces, so the oracle compare
  *    never parses timestamps.
  */
object Sessions {

  /** Sessions per user with an inactivity gap of `gapSeconds` (default
    * 24 h — the fixture's median inter-event gap per user is ~7 h, so a
    * day of silence is a natural boundary).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 86400L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val flagged = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        sum(col("cents")).as("sum_cents"))
      .orderBy("user_id", "session_id")
  }

  /** INTERVAL-OVERLAP JOIN between the session table and "incident"
    * hours (per-type hourly bars running ≥ 25% over the series'
    * integer-mean rate): which sessions ran through an anomalous hour,
    * and how many such hours they touched. The ops-analytics composition
    * "join my sessions to my alerts" expressed as a non-equi interval
    * overlap: session [s, e] × bar [b, b+H) with s < b+H AND b ≤ e.
    *
    * Join-strategy note (this is the third point on the non-equi-join
    * strategy surface): the incident side is METADATA-SCALE — bounded by
    * bars × series, independent of event volume — so the right plan is a
    * BROADCAST nested-loop with the overlap predicate: per-row work is
    * |incidents|, with no shuffle of the session side at all. When BOTH
    * interval sets scale with the data, this becomes [[JoinOps
    * .proximityJoin]]'s bucket-expansion equi-join; when one side is a
    * point set, [[JoinOps.rangeJoin]]. Choosing by the small side's
    * CARDINALITY CLASS (metadata vs data) is the decision rule.
    *
    * LEFT join: sessions that dodge every incident report zero touched
    * hours — the untouched-session mass is the interesting denominator.
    */
  def sessionIncidentOverlap(events: DataFrame,
      barUs: Long = 3600000000L): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val sessions = sessionize(events)
    val incidents = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("bar_us", expr(s"(us div ${barUs}L) * ${barUs}L"))
      .groupBy("event_type", "bar_us")
      .agg(count(lit(1)).as("n"))
      .withColumn("target", expr("sum(n) OVER (PARTITION BY event_type) div " +
        "count(n) OVER (PARTITION BY event_type)"))
      .filter(col("n") * 4 >= col("target") * 5 + 4)
      .select(col("event_type").as("inc_type"), col("bar_us"))
    sessions.join(broadcast(incidents),
        sessions("start_us") < incidents("bar_us") + lit(barUs) &&
          incidents("bar_us") <= sessions("end_us"), "left")
      .groupBy("user_id", "session_id", "start_us", "end_us")
      .agg(count(col("bar_us")).as("n_incident_hours"),
        countDistinct(col("inc_type")).as("n_incident_types"))
      .orderBy("user_id", "session_id")
  }

  /** SEQUENTIAL funnel conversion — the other canonical event-analytics
    * shape: how many users VIEWED, then CLICKED at-or-after their first
    * view, then PURCHASED at-or-after that click. Order matters: a
    * purchase BEFORE the first view does not convert (set-intersection
    * "funnels" overcount exactly those users), so each stage's timestamp
    * is the earliest qualifying event at-or-after the previous stage's.
    *
    * Shape: the three stage timestamps are chained whole-partition
    * window minima over ONE user_id exchange (same partitioning, no
    * ordering — Catalyst plans all three WindowExecs over a single
    * Exchange), collapsed per user (reusing that partitioning), then one
    * tiny global aggregate emits the 3-row report. Ties are safe: every
    * comparison is >= on exact integer microseconds. Conversion rates in
    * integer permille (floor), denominated by the FIRST stage.
    */
  def funnel(events: DataFrame, steps: Seq[String] =
      Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val byUser = Window.partitionBy("user_id")
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val staged = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("event_type") === step
        else col("event_type") === step && col("us") >= col(s"t${i - 1}")
      df.withColumn(s"t$i", min(when(cond, col("us"))).over(byUser))
    }
    val stageMaxes = steps.indices.map(i => max(col(s"t$i")).as(s"t$i"))
    val perUser = staged.groupBy("user_id")
      .agg(stageMaxes.head, stageMaxes.tail: _*)
    val stageCounts = steps.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"n$i"))
    val counts = perUser.agg(stageCounts.head, stageCounts.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("step_name"),
        col(s"n$i").as("n_users"),
        expr(s"CASE WHEN n0 = 0 THEN 0 ELSE n$i * 1000 DIV n0 END")
          .as("conv_permille"))
    }
    counts.select(inline(array(rows: _*))).orderBy("step")
  }

  /** LAST-TOUCH ATTRIBUTION (e17): every purchase attributed to the
    * user's most recent click at-or-before it, within a lookback window —
    * the fourth canonical event-analytics shape (sessions, funnels,
    * cohorts, attribution). Purchases with no qualifying click emit NULL
    * attribution (organic conversions), which downstream marketing spend
    * reports need kept visible, not dropped.
    *
    * Shape: clicks and purchases merge into ONE per-user ordered stream
    * and the running "last click" carries forward via
    * `last(..., ignoreNulls)` over rows-unbounded-preceding — a single
    * keyed exchange, no self-join (the textbook correlated-subquery or
    * per-purchase lookup is a join whose probe side is every purchase;
    * the merged-stream form is the as-of-join plan [[JoinOps]] j9 uses,
    * specialized to carry attribution attributes). At equal timestamps
    * the click sorts BEFORE the purchase (kind 0 < 1), so a same-instant
    * click is attributable — and among same-instant clicks the largest
    * event_id wins, deterministically.
    */
  def lastTouchAttribution(events: DataFrame,
      lookbackUs: Long = 3600000000L): DataFrame = {
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "click", 0).otherwise(1).as("k"))
    val w = Window.partitionBy("user_id").orderBy("us", "k", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributable = col("last_click_us").isNotNull &&
      col("us") - col("last_click_us") <= lookbackUs
    base
      .withColumn("last_click_id",
        last(when(col("k") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_us",
        last(when(col("k") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("k") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        when(attributable, col("last_click_id")).as("click_id"),
        when(attributable, col("us") - col("last_click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** COHORT RETENTION — the third canonical event-analytics shape after
    * sessions and funnels: bucket users by the week of their FIRST event
    * (the cohort), then count how many of each cohort are still active
    * 0, 1, 2… weeks later. Long format (one row per cohort × offset), the
    * join-free shape a BI layer pivots client-side.
    *
    * Weeks are integer day-arithmetic from a fixed anchor
    * (`days_since(anchor) div 7`), not calendar `date_trunc('week')`:
    * the anchor form is engine-independent by construction (no
    * Monday-vs-Sunday or ISO-week ambiguity between engines).
    *
    * Shape: ONE exchange on `user_id` does all the per-user work —
    * `collect_set(week)` per user (map-side combined, the set is at most
    * `observed weeks` long, bounded by the calendar, not the event
    * count), then a row-local explode with `array_min` as the cohort —
    * instead of the textbook distinct + self-join-on-first-event plan,
    * which shuffles twice and joins once. The (cohort, offset) grid that
    * follows is calendar²-bounded (~dozens of rows), so its exchange and
    * the cohort-size window over it are metadata-scale at any corpus
    * size. Retention is floor-permille against the offset-0 cohort size.
    */
  def cohortRetention(events: DataFrame, anchor: String = "2024-01-01"): DataFrame = {
    val weeks = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        expr(s"datediff(CAST(ts AS DATE), DATE '$anchor') div 7").as("week"))
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("week"))).as("wks"))
      .select(col("user_id"), explode(col("wks")).as("week"),
        element_at(col("wks"), 1).as("cohort_week"))
    val byCohort = Window.partitionBy("cohort_week")
    weeks
      .groupBy("cohort_week", "week")
      .agg(count(lit(1)).as("n_active"))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(byCohort))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000 div cohort_size").as("retention_permille"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Gap-based sessions via Spark's NATIVE `session_window` operator —
    * the built-in counterpart to the hand-rolled gaps-and-islands
    * [[sessionize]] (e6), exercised the way e14 exercises `window()`:
    * because this is the exact operator a Structured Streaming
    * `session_window` aggregation compiles to, pinning its batch
    * semantics against an engine-independent oracle pins the streaming
    * semantics too.
    *
    * Exactness: a session extends while the next event starts AT OR
    * before `last_ts + gap` — Spark merges sessions whose ranges touch,
    * so a gap of EXACTLY `gap` stays one session (spec-witnessed on a
    * crafted boundary; the naive half-open reading is wrong). That is
    * the same `diff <= gap merges` convention as [[sessionize]], so the
    * oracle re-derives boundaries with `diff > gap` integer-µs
    * arithmetic, and `end = max(ts) + gap` is µs-exact because
    * Tables.events floors nanos to µs before the operator sees them.
    *
    * Scale shape: ONE exchange on user_id, then a sort-based in-partition
    * session merge (UpdatingSessions/MergingSessionsExec) — no
    * self-join, no window-function second pass; equal-timestamp ties
    * cannot flip boundaries (diff 0 always merges).
    */
  def nativeSessionWindows(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("sum_cents"))
      .orderBy("user_id", "start_us")

  /** EVENT-TYPE TRANSITION MATRIX (first-order Markov estimate): for every
    * consecutive pair of events in a user's stream, count the
    * (prev_type → next_type) transition, its share among all transitions
    * leaving `prev_type` (integer basis points — no FP ratios), and the
    * floor-average inter-event gap in µs. This is the navigation /
    * behavioral-flow summary every event-analytics stack derives (Sankey
    * funnels, next-action prediction priors, bot-detection loops such as
    * view→view self-transitions with near-zero gaps).
    *
    * Shape: ONE keyed exchange on `user_id` computes the `lag` pair
    * (same (us, event_id) deterministic ordering as [[sessionize]] — ties
    * cannot flip the PAIR MULTISET, only which equal-time event is called
    * "prev", and both engines order identically); the (prev, next) grid
    * that follows is |event_type|² ≤ dozens of rows, so its aggregation
    * and the share window over it are metadata-scale at any corpus size.
    * The textbook self-join-on-row-number form pays a second full-data
    * exchange for the same pairs; the lag form never re-shuffles the
    * events.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val out = Window.partitionBy("prev_type")
    pairs
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("us") - col("prev_us")).as("sum_gap_us"))
      .withColumn("out_total", sum(col("n_transitions")).over(out))
      .withColumn("share_bp", expr("n_transitions * 10000 div out_total"))
      .select(col("prev_type"), col("next_type"), col("n_transitions"),
        col("share_bp"),
        expr("sum_gap_us div n_transitions").as("avg_gap_us"))
      .orderBy("prev_type", "next_type")
  }

  /** SEQUENTIAL PATH MINING (order-3): counts every consecutive
    * event-type TRIGRAM in a user's stream — the length-3 extension of
    * [[eventTransitions]] and the building block of sequential-pattern
    * mining (the contiguous-sequence special case of PrefixSpan, which is
    * the variant that stays a single window pass instead of an iterative
    * candidate join). `n_users` counts how many distinct users ever walk
    * the path, separating "one bot loops view→view→view" from "everyone
    * does".
    *
    * Shape: the same single `user_id` exchange as [[eventTransitions]] —
    * two `lead`s over one (us, event_id)-ordered window (one WindowExec,
    * O(1) state per row), then a grid aggregation whose output is
    * ≤ |event_type|³ rows. The distinct-user count re-shuffles only the
    * (trigram, user) pairs — already ≤ one row per input event post-grid.
    * The alternative rn-self-join form pays three full-data exchanges for
    * the same trigram multiset.
    */
  def trigramPaths(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(byUser))
      .withColumn("e3", lead(col("e1"), 2).over(byUser))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
  }

  /** SLIDING-WINDOW event stats via Spark's NATIVE `window()` generator
    * (30-minute windows every 10 minutes): each event lands in
    * window/slide = 3 overlapping windows, counted per (window, type).
    * This is the one event-analytics shape deliberately expressed through
    * the built-in windowing op rather than hand-rolled arithmetic — the
    * generator is what Structured Streaming time-windows compile to, so
    * exercising it in batch pins the exact semantics a streaming port
    * would inherit.
    *
    * Exactness: Spark aligns window starts to the epoch in multiples of
    * the slide (`TimeWindow` rewrite), i.e. the starts covering an event
    * at microsecond `t` are `(t div slide)*slide - i*slide` for
    * `i ∈ [0, win/slide)` — pure integer arithmetic any engine can
    * replicate, which is exactly how the oracle derives them. Start is
    * emitted as epoch-µs BIGINT, money in integer cents.
    *
    * Scale shape: the generator is a row-local explode (3 rows out per
    * event — a constant factor, NOT a join), followed by one hash
    * aggregate on (window, type). `n_users` makes the agg two-phase
    * (distinct expansion), still partial-pushed. No window functions, no
    * per-user exchange: at 100 TB this is scan → ×3 explode → one
    * shuffle on a key whose cardinality is calendar × type — tiny.
    */
  def slidingWindowStats(events: DataFrame,
      winMinutes: Int = 30, slideMinutes: Int = 10): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .select(
        window(col("ts"), s"$winMinutes minutes", s"$slideMinutes minutes")
          .as("w"),
        col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents"))
      .orderBy("window_start_us", "event_type")

  /** INCREMENTAL SESSIONIZATION across a batch boundary: process the
    * stream in two time-contiguous batches, carrying per-user OPEN-SESSION
    * state over the cut, and produce a session table IDENTICAL to the
    * one-shot [[sessionize]] over the whole stream — the production
    * pattern that absorbs each day's events at cost ∝ batch + state
    * instead of re-sessionizing all history. The registered oracle is the
    * ONE-SHOT SQL, so "incremental == full recompute" is exactly what the
    * hash gate proves (the [[MergeOps.joinMaintenanceDemo]] algebra,
    * applied to a stateful window operator).
    *
    * Mechanics: each user's LAST batch-1 session is the carried state
    * (it may still be open at the cut). Batch 2 sessionizes alone with
    * per-user LOCAL ids, then one equi-join on user_id decides
    * continuation — first batch-2 event within `gapSeconds` of the
    * state's end merges into the carried session (summing counts/cents,
    * keeping its start), otherwise the carried session closes unchanged —
    * and shifts local ids by the carried numbering. Every step is
    * batch-/state-sized; history is touched only through the state table.
    *
    * `cutUs` defaults to the driver-computed midpoint of the observed
    * time range, so the demo genuinely exercises both batches at any
    * fixture scale.
    */
  def incrementalSessionize(events: DataFrame, gapSeconds: Long = 86400L,
      cutUs: Option[Long] = None): DataFrame = {
    val base = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val cut = cutUs.getOrElse {
      val r = base.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      (r.getLong(0) + r.getLong(1)) / 2
    }
    val batch1 = base.filter(unix_micros(col("ts")) < cut)
    val batch2 = base.filter(unix_micros(col("ts")) >= cut)
    val s1 = sessionize(batch1, gapSeconds)
    // carried state: each user's last batch-1 session (possibly open)
    val lastW = Window.partitionBy("user_id").orderBy(col("session_id").desc)
    val ranked1 = s1.withColumn("_rn", row_number().over(lastW))
    val closed1 = ranked1.filter(col("_rn") > 1).drop("_rn")
    val state = ranked1.filter(col("_rn") === 1).drop("_rn")
    val s2 = sessionize(batch2, gapSeconds)
      .withColumnRenamed("session_id", "local_id")
    val st = state.select(col("user_id"),
      col("session_id").as("st_id"), col("start_us").as("st_start"),
      col("end_us").as("st_end"), col("n_events").as("st_n"),
      col("sum_cents").as("st_sum"))
    val joined = s2.join(st, Seq("user_id"), "full_outer")
      .withColumn("continues",
        col("st_id").isNotNull && col("local_id") === 1L &&
          col("start_us") - col("st_end") <= gapSeconds * 1000000L)
    // per-user shift: did local session 1 merge into the carried session?
    val userShift = joined.filter(col("local_id") === 1L)
      .select(col("user_id"),
        when(col("continues"), lit(1L)).otherwise(lit(0L)).as("merge1"),
        coalesce(col("st_id"), lit(0L)).as("base_id"))
    val merged = joined.join(userShift, Seq("user_id"), "left")
      .select(col("user_id"),
        col("local_id"), col("st_id"), col("continues"),
        col("start_us"), col("end_us"), col("n_events"), col("sum_cents"),
        col("st_start"), col("st_end"), col("st_n"), col("st_sum"),
        coalesce(col("merge1"), lit(0L)).as("merge1"),
        coalesce(col("base_id"), col("st_id"), lit(0L)).as("base_id"))
    val fromBatch2 = merged.filter(col("local_id").isNotNull)
      .select(col("user_id"),
        (col("base_id") + col("local_id") - col("merge1")).as("session_id"),
        when(col("continues"), col("st_start")).otherwise(col("start_us"))
          .as("start_us"),
        col("end_us"),
        (col("n_events") + when(col("continues"), col("st_n")).otherwise(0L))
          .as("n_events"),
        (col("sum_cents") + when(col("continues"), col("st_sum")).otherwise(0L))
          .as("sum_cents"))
    // carried sessions that nothing in batch 2 continued close unchanged
    val stateClosed = merged
      .filter(col("st_id").isNotNull &&
        (col("local_id").isNull || (col("local_id") === 1L && !col("continues"))))
      .select(col("user_id"), col("st_id").as("session_id"),
        col("st_start").as("start_us"), col("st_end").as("end_us"),
        col("st_n").as("n_events"), col("st_sum").as("sum_cents"))
    closed1.unionByName(stateClosed).unionByName(fromBatch2)
      .orderBy("user_id", "session_id")
  }

  /** MATCH_RECOGNIZE-lite: count `view click* purchase` pattern matches
    * in each user's event sequence — the contiguous-funnel upgrade of
    * [[funnel]] (which only asks "did the stages happen in order,
    * anywhere"): here NOTHING may interrupt the path from view to
    * purchase except clicks, which is Flink/Trino `MATCH_RECOGNIZE
    * (PATTERN (V C* P))` semantics with skip-past-last-row, a construct
    * Spark SQL lacks.
    *
    * Technique — EVENT-STRING PROJECTION: each user's totally-ordered
    * event stream (order by (µs, event_id) — dq31 proves same-µs
    * collisions exist, the id breaks them) projects to one character per
    * event, and the pattern runs as an anchored-nowhere greedy regex
    * over that string; non-overlapping leftmost matching IS the
    * skip-past-last-row semantics, identically in both engines' regex
    * planes. One keyed aggregate builds the string (state ∝ events per
    * user — the same per-key bound sessionization already carries), the
    * regex scans are map-side; nothing shuffles twice.
    *
    * Outputs per user: total events, direct + click-assisted (≥1 click)
    * conversion counts, and the longest click run inside any match —
    * the path-friction readout. All integers, hash-exact.
    */
  def patternMatch(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ch"))
    base
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", expr(
          "transform(array_sort(collect_list(struct(us, event_id, ch))), x -> x.ch)"))
          .as("s"))
      .select(col("user_id"), col("n_events"),
        regexp_count(col("s"), lit("vc*p")).cast("long").as("n_paths"),
        regexp_count(col("s"), lit("vc+p")).cast("long").as("n_assisted"),
        coalesce(
          array_max(expr(
            "transform(regexp_extract_all(s, 'vc*p', 0), m -> length(m) - 2)"))
            .cast("long"),
          lit(0L)).as("max_clicks_in_path"))
      .orderBy("user_id")
  }

  /** TIME-DECAY multi-touch attribution — the fractional-credit
    * counterpart to [[lastTouchAttribution]]'s winner-take-all: every
    * click/view in the `lookbackDays` window before a purchase earns a
    * share of its value, halving per day of age (weight 2^(L−1−age)).
    *
    * Exactness: per-conversion credit v·wᵢ/W is irrational territory in
    * floats, so each touch takes the FLOOR share v·wᵢ div W and the
    * rounding residual v − Σ floors goes to the MOST RECENT touch
    * (deterministic (tus, event_id) order) — credits sum to the
    * purchase value EXACTLY, per conversion, by construction. Purchases
    * with no in-window touch emit under 'unattributed', so the output
    * totals the full purchase volume — the reconciliation a revenue
    * dashboard demands.
    *
    * Scale shape: the purchase×touch pairing is a per-user equi-join
    * whose fan-out the lookback window bounds (≤ touches-per-user-per-
    * L-days per purchase); both credit windows partition by purchase id
    * — state ∝ touches of ONE conversion. At 100 TB you'd bucket both
    * sides by (user, day) to co-locate; the join key and windows are
    * already the right ones.
    */
  def decayAttribution(events: DataFrame, lookbackDays: Int = 3): DataFrame = {
    // shiftleft(1L, lookbackDays - 1 - age) silently overflows the Long
    // shift past 62 — same bound ewma enforces on its horizon.
    require(lookbackDays >= 1 && lookbackDays <= 62,
      s"lookbackDays must be in [1, 62], got $lookbackDays")
    val dayUs = 86400000000L
    val purchases = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"),
        round(col("value") * 100).cast("long").as("v"))
    val touches = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        unix_micros(col("ts")).as("tus"), col("event_type").as("t_type"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("tus") < col("pus") &&
        col("pus") - col("tus") < lookbackDays * dayUs)
      .withColumn("w", expr(
        s"shiftleft(1L, ${lookbackDays - 1} - cast((pus - tus) div $dayUs as int))"))
    val wSum = Window.partitionBy("p_id")
    val wTop = Window.partitionBy("p_id")
      .orderBy(col("tus").desc, col("t_id").desc)
    val credited = joined
      .withColumn("wtot", sum("w").over(wSum))
      .withColumn("base", expr("v * w div wtot"))
      .withColumn("assigned", sum("base").over(wSum))
      .withColumn("rn", row_number().over(wTop))
      .select(col("t_type"),
        (col("base") + when(col("rn") === 1, col("v") - col("assigned"))
          .otherwise(0L)).as("credit"))
    val unattributed = purchases
      .join(joined.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .select(lit("unattributed").as("t_type"), col("v").as("credit"))
    credited.unionAll(unattributed)
      .groupBy("t_type")
      .agg(count(lit(1)).as("n_credits"), sum("credit").as("credited_cents"))
      .orderBy("t_type")
  }

  /** ADOPTION CURVE — daily activity with the cumulative distinct-user
    * count, computed the only way that scales: a user contributes to the
    * cumulative line exactly once, on their FIRST-SEEN day, so the curve
    * is a running SUM of first-seen counts over the day grid. The naive
    * form (`COUNT(DISTINCT user) OVER (ORDER BY day)`) re-scans every
    * prior day's users per output row — quadratic state and the classic
    * dashboard query that dies at scale; first-seen linearizes it.
    *
    * Scale shape: one map-side-combining per-user MIN (∝ users), one
    * per-day count (∝ days), one per-day event count, and a cumulative
    * window over the day grid only. All exact integers.
    */
  def adoptionCurve(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000")
        .as("day"))
    val newPerDay = base.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new_users"))
    val evPerDay = base.groupBy("day").agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    evPerDay
      .join(newPerDay, Seq("day"), "left")
      .na.fill(0L, Seq("n_new_users"))
      .withColumn("cum_users", sum("n_new_users").over(w))
      .orderBy("day")
  }

  /** GROWTH ACCOUNTING — the weekly active-user ledger every growth
    * team runs: actives decomposed into NEW (first week ever), RETAINED
    * (also active the week before), RESURRECTED (active before, but not
    * last week), plus CHURNED-AWAY (active last week, absent this one),
    * so n_active(w) = n_active(w−1) + new + resurrected − churned holds
    * exactly. Classification never scans history per row: one distinct
    * (user, week) frame, one per-user MIN (first week), and one
    * self-join against the week-shifted frame decide all three classes;
    * churn is a shifted anti-join. Work ∝ distinct user-weeks — the
    * same first-seen/shift discipline as [[adoptionCurve]].
    *
    * Weeks with zero actives don't emit (nothing to decompose); churn
    * INTO such a week is attributed when activity resumes — documented
    * ledger semantics, identical in both engines.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val wkUs = 7L * 86400000000L
    val uw = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), expr(s"unix_micros(ts) div $wkUs").as("wk"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min("wk").as("first_wk"))
    val prev = uw.select(col("user_id"), (col("wk") + 1).as("wk"),
      lit(1L).as("had_prev"))
    val classified = uw
      .join(first, Seq("user_id"))
      .join(prev, Seq("user_id", "wk"), "left")
      .select(col("wk"),
        when(col("wk") === col("first_wk"), lit("new"))
          .when(col("had_prev").isNotNull, lit("retained"))
          .otherwise(lit("resurrected")).as("cls"))
    val active = classified.groupBy("wk")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val churn = uw.select(col("user_id"), (col("wk") + 1).as("wk"))
      .join(uw, Seq("user_id", "wk"), "left_anti")
      .groupBy("wk").agg(count(lit(1)).as("n_churned"))
    active
      .join(churn, Seq("wk"), "left")
      .na.fill(0L, Seq("n_churned"))
      .orderBy("wk")
  }

  /** STICKINESS (DAU/WAU) — the engagement ratio product teams track
    * weekly: average daily actives over weekly actives, floor permille
    * (1000 = every weekly user shows up every day; 143 ≈ once a week).
    * Rendered exactly: Σ_day DAU(d) · 1000 div (7 · WAU(w)) — the sum
    * of daily actives is the integral the "average DAU" hides, and the
    * fixed 7 keeps partial trailing weeks honest (a 3-day week reads
    * low rather than inflated).
    *
    * Scale shape: two distinct frames off one pass — (user, day) and
    * (user, week) — each a map-side-combining distinct, then per-day /
    * per-week counts and one week-keyed join. Work ∝ distinct
    * user-days; no window over raw events.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val dauSum = base
      .groupBy(expr("day div 7").as("wk"))
      .agg(count(lit(1)).as("dau_sum"))
    val wau = base.select(col("user_id"), expr("day div 7").as("wk"))
      .distinct()
      .groupBy("wk").agg(count(lit(1)).as("wau"))
    dauSum.join(wau, Seq("wk"))
      .select(col("wk"), col("dau_sum"), col("wau"),
        expr("dau_sum * 1000 div (7 * wau)").as("stickiness_permille"))
      .orderBy("wk")
  }
}
