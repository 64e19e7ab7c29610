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
}
