package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function inventory (SURVEY.md §2.3, W1-W3) + the standard
  * analytic family the Athena-SQL surface implies (ranking, frames,
  * lead/first/last, ntile — SURVEY.md §2.3 note).
  *
  * The reference's only window op is row-offset `lag` 7/30
  * (`/root/reference/src/glue/b3_transform.py:69-81`) — covered by
  * [[B3Pipeline.withVariations]]. This file adds the parity family.
  *
  * Scale notes: every query here partitions its window by a key
  * (`l_orderkey` / `user_id`) — never an empty partitionBy, which would
  * funnel 100 TB through a single task. Functions sharing a (partition,
  * order) pair share one WindowExec: one exchange + one sort total.
  */
object WindowOps {

  /** Ranking family. `row_number` orders by a verified-unique key tuple
    * (fixture lineitem duplicates `(l_orderkey, l_linenumber)` — ties would
    * make it nondeterministic); `rank`/`dense_rank` order by quantity alone
    * — tied rows get equal ranks, which IS deterministic. Output is totally
    * ordered by `(l_orderkey, rn)`, unique by construction.
    */
  def rankFamily(lineitem: DataFrame): DataFrame = {
    val unique = Window.partitionBy("l_orderkey")
      .orderBy(col("l_quantity").desc, col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
    val byQty = Window.partitionBy("l_orderkey").orderBy(col("l_quantity").desc)
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(unique).as("rn"),
        rank().over(byQty).as("rnk"),
        dense_rank().over(byQty).as("drnk"))
      .orderBy("l_orderkey", "rn")
  }

  /** Moving sum + average over a bounded 7-row frame — the 7-period
    * pattern of the reference's lag analysis as a frame aggregate.
    *
    * Frame sums go through decimal(18,2) (fixture `value` is exactly
    * 2-decimal, so the cast is lossless): engines may associate
    * floating-point frame sums differently (segment trees vs rescans),
    * which flips round() at boundaries — decimal arithmetic is exact and
    * engine-independent. The avg divides two bit-identical operands, so it
    * is exact on both sides too.
    */
  def movingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(-6, Window.currentRow)
    val msum = sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
    val cnt = count(lit(1)).over(w)
    // mavg rounds at 4 decimals, not 2: sum/count of 2-decimal values with
    // count ≤ 7 can land exactly on a .005 boundary (e.g. 144.17/2 =
    // 72.085), where Spark (decimal-string) and other engines (binary
    // double) round in opposite directions. No such boundary exists at the
    // 4th decimal for these denominators.
    events
      .select(col("event_id"), col("user_id"), col("value"),
        round(msum, 2).as("msum_7"),
        round(msum / cnt, 4).as("mavg_7"))
      .orderBy("event_id")
  }

  /** ROLLING ROBUST STATISTICS — the window-parity op Spark has no
    * builtin for: per-key rolling (lower) median and discrete quartiles
    * over a 7-row frame, for outlier-resistant smoothing where a rolling
    * MEAN ([[movingAvg]]) is dragged by a single spike. Built as
    * `element_at(array_sort(collect_list(cents) over frame), pick)` with
    * the discrete pick at 1-based index ⌈q·n⌉ (verified against DuckDB
    * `quantile_disc` for every frame length 1-7 — NOT the 1 + ⌊q·(n−1)⌋
    * variant, which diverges at q=0.75, n=2) — integer cents in, integer
    * cents out, no interpolation anywhere, so the oracle reproduces it
    * bit-for-bit.
    *
    * Scale note: the collect_list frame holds ≤ 7 elements per row by
    * construction — state is O(frame), not O(partition); same single
    * keyed exchange + sort as every other window here. For large frames
    * the right tool changes (two-heap streaming median via
    * mapGroupsWithState, or [[Aggregates.percentiles]]' bucket refinement
    * per window bucket) — at frame widths used for smoothing, the sorted
    * array IS the fast plan (7 elements sort in-register).
    */
  def rollingMedian(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // the sorted frame array is projected ONCE, then picked three times —
    // six window-expression references would risk recomputing the
    // collect_list per pick (the shingles3Tokens multi-reference lesson)
    def pick(q: Double) = element_at(col("a7"),
      ceil(lit(q) * size(col("a7"))).cast("int"))
    // r11 optimization round: frame built from six O(1) lags + current
    // row in ONE WindowExec pass instead of a sliding collect_list
    // object aggregate (re-collected per row); array_compact drops
    // exactly what collect_list skipped (missing lags at partition
    // start, null cents). Same sorted array per row — see
    // Quality.hampelOutliers for the full argument.
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .select(col("event_id"), col("user_id"), col("cents"),
        array_sort(array_compact(array(
          (6 to 1 by -1).map(k => lag(col("cents"), k).over(w)) :+ col("cents"): _*)))
          .as("a7"))
      .select(col("event_id"), col("user_id"), col("cents"),
        pick(0.5).as("med_7"), pick(0.25).as("p25_7"), pick(0.75).as("p75_7"))
      .orderBy("event_id")
  }

  /** Running (cumulative) sum + count per key (decimal-exact, see
    * [[movingAvg]]).
    */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        round(sum(col("value").cast("decimal(18,2)")).over(w).cast("double"), 2)
          .as("running_sum"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("event_id")
  }

  /** SHARE-OF-GROUP (ratio_to_report): each supplier's revenue as an
    * integer basis-point share of its nation's total — the percent-of-
    * total window every BI layer reduces to. Whole-partition sum frame
    * over integer cents; share = cents·10000 div nation_cents, exact
    * floor arithmetic (no FP ratio to disagree on). One exchange on the
    * partition key; at 100 TB the nation totals could equivalently come
    * from a broadcast pre-aggregate, but the window form keeps the row
    * count and avoids the join when per-row detail is wanted anyway.
    */
  def shareOfGroup(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val revenue = lineitem
      .groupBy("l_suppkey")
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
    val byNation = Window.partitionBy("s_nationkey")
    supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("cents"),
        sum(col("cents")).over(byNation).as("nation_cents"))
      .select(col("s_suppkey"), col("s_nationkey"), col("cents"),
        expr("cents * 10000 DIV nation_cents").as("share_bp"))
      .orderBy("s_suppkey")
  }

  /** ROLLING DISTINCT COUNT — `count(distinct)` is not a supported
    * window function on any engine. The naive rewrite (windowed
    * `collect_list` + `array_distinct`) costs ∝ rows × frame — at a
    * 250-row frame that is 250× the data moved per row, and it measured
    * 9.7 s at sf0.1. This is the O(rows) duplicate-link formulation:
    *
    *   distinct-in-frame(R) = |frame(R)| − #{rows r ∈ frame whose
    *                           PREVIOUS occurrence of the same user
    *                           is also inside frame(R)}
    *
    * (each distinct user is over-counted once per repeat whose
    * predecessor link lies wholly inside the frame — subtracting the
    * in-frame links leaves exactly the first-in-frame occurrences).
    * A link (p, q) = (prev position, position) with gap ≤ frame−1 is
    * inside frame(R) = [R−frame+1, R] exactly for R ∈ [q, p+frame−1],
    * so each link becomes a +1 delta at position q and a −1 delta at
    * position p+frame; a running RANGE-frame sum over position then
    * yields the in-frame-link count at every row — constant state per
    * row instead of a frame-sized array. Three keyed exchanges
    * (position numbering, per-user lag, final running sum), all O(n)
    * — the shape survives any frame width, where the array rewrite's
    * memory is the frame itself.
    */
  def rollingDistinct(events: DataFrame, frame: Int = 500): DataFrame = {
    val wPos  = Window.partitionBy("event_type").orderBy("event_id")
    val wUser = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    val pos = events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .withColumn("rn", row_number().over(wPos))
      .withColumn("prev_rn", lag(col("rn"), 1).over(wUser))
    // links longer than the frame can never have both endpoints inside
    // one frame — dropped before the union, not filtered per row.
    val links = pos.filter(col("prev_rn").isNotNull &&
      col("rn") - col("prev_rn") <= frame - 1)
    val deltas = links
      .select(col("event_type"), col("rn").cast("long").as("pos"),
        lit(1L).as("delta"))
      .unionAll(links.select(col("event_type"),
        (col("prev_rn") + frame).cast("long").as("pos"), lit(-1L).as("delta")))
      .select(col("event_type"), col("pos"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("int").as("rn"), col("delta"))
    val rows = pos.select(col("event_type"), col("rn").cast("long").as("pos"),
      col("event_id"), col("rn"), lit(0L).as("delta"))
    // RANGE (not ROWS) running frame: delta rows share a `pos` with the
    // data row they act on, and both the +1 at q = R and the −1 at
    // p+frame = R must be included AT row R — peers-by-value gives that
    // tie handling for free, with no dependence on union order.
    val wCum = Window.partitionBy("event_type").orderBy("pos")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    rows.unionAll(deltas)
      .withColumn("dups", sum(col("delta")).over(wCum))
      .filter(col("event_id").isNotNull)
      .select(col("event_id"), col("event_type"),
        (least(col("rn").cast("long"), lit(frame.toLong)) - col("dups"))
          .as("distinct_users"))
      .orderBy("event_id")
  }

  /** lead / first / last over one shared ordered window. */
  def leadFirstLast(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(whole).as("first_value"),
        last(col("value")).over(whole).as("last_value"))
      .orderBy("event_id")
  }

  /** RANGE frame (vs ROWS): peers by ORDER-BY VALUE distance, not row
    * position — count of events within 100 event_ids back per user.
    * Decimal-exact sum as in [[movingAvg]].
    */
  def rangeFrame(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rangeBetween(-100, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        count(lit(1)).over(w).as("n_in_range"),
        round(sum(col("value").cast("decimal(18,2)")).over(w).cast("double"), 2)
          .as("sum_in_range"))
      .orderBy("event_id")
  }

  /** percent_rank / cume_dist / ntile quartiles per order. Window order is
    * the verified-unique tuple (no peers → deterministic values); output
    * totally ordered by `(l_orderkey, rn)`.
    */
  def distributionRanks(lineitem: DataFrame): DataFrame = {
    val unique = Window.partitionBy("l_orderkey")
      .orderBy(col("l_quantity"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(unique).as("rn"),
        round(percent_rank().over(unique), 6).as("pct_rank"),
        round(cume_dist().over(unique), 6).as("cume"),
        ntile(4).over(unique).as("quartile"))
      .orderBy("l_orderkey", "rn")
  }

  /** Calendar GAP-FILL with forward-fill (time-series resampling): the
    * reference's domain is daily OHLCV bars, where non-trading days leave
    * holes that break row-offset analytics (`lag(7)` means "7 bars", not
    * "7 days", exactly because of gaps). This operator materializes each
    * key's full calendar between its first and last observation and
    * carries the last observation forward into the holes.
    *
    * Scale shape: the per-key daily aggregate shuffles once;
    * `sequence(min, max)` explodes bounded-by-span calendar rows per key
    * (dates, not data — a 20-year daily calendar is ~7 k rows/key); the
    * left join is keyed; the forward-fill is `last(value, ignoreNulls)`
    * over a keyed running frame — one keyed sort, no global window.
    * The daily "close" is `max_by(value, event_id)` — the LAST event of
    * the day by monotone id, deterministic under shuffle order.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("date"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    val calendar = daily
      .groupBy("user_id")
      .agg(min("date").as("lo"), max("date").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("date"))
    val w = Window.partitionBy("user_id").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(daily, Seq("user_id", "date"), "left")
      .select(col("user_id"), col("date"),
        last(col("v"), ignoreNulls = true).over(w).as("value_filled"),
        col("v").isNull.as("is_filled"))
      .orderBy("user_id", "date")
  }

  /** LONGEST MONOTONE STREAK per series (gaps-and-islands on the step
    * DIRECTION): the longest run of strictly-rising and strictly-falling
    * consecutive steps in each user's value sequence — the "N green days
    * in a row" / consecutive-failures metric. A streak is counted in
    * STEPS (a lone observation has streak 0); equal consecutive values
    * break both directions. Comparisons are on integer cents, so
    * direction is engine-exact.
    *
    * Plan shape: one lag() window computes both direction flags in a
    * single pass over the (user)-keyed sort; each row then emits its
    * (direction, run-id) pair via a 2-element inline explode (run-id =
    * running count of breaks — the cumulative-sum islands trick), and
    * run lengths fall out of a (user, direction, run) aggregate that a
    * final (user) aggregate maxes and pivots to two columns with
    * conditional max — aggregates, not a second window. Every stage
    * keys on user_id ⊆ its grouping, so the plan reuses one hash
    * partitioning end to end.
    */
  def streaks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = events
      .filter(col("ts").isNotNull && col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("up",
        when(col("cents") > lag(col("cents"), 1).over(w), 1L).otherwise(0L))
      .withColumn("dn",
        when(col("cents") < lag(col("cents"), 1).over(w), 1L).otherwise(0L))
      .withColumn("up_run", sum(lit(1L) - col("up")).over(run))
      .withColumn("dn_run", sum(lit(1L) - col("dn")).over(run))
    val runs = stepped.select(col("user_id"),
        explode(array(
          struct(lit("up").as("dir"), col("up_run").as("run"), col("up").as("step")),
          struct(lit("dn").as("dir"), col("dn_run").as("run"), col("dn").as("step"))))
          .as("x"))
      .groupBy(col("user_id"), col("x.dir"), col("x.run"))
      .agg(sum(col("x.step")).as("len"), count(lit(1)).as("n_rows"))
    // n_events recovered from the up-side row counts — no second scan of
    // the input (each event contributed exactly one 'up' exploded row).
    runs.groupBy("user_id")
      .agg(sum(when(col("dir") === "up", col("n_rows")).otherwise(0L)).as("n_events"),
        max(when(col("dir") === "up", col("len"))).as("longest_up"),
        max(when(col("dir") === "dn", col("len"))).as("longest_down"))
      .orderBy("user_id")
  }
}
