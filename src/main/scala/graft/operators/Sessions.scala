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
}
