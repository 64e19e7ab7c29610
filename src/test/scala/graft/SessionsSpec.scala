package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessions

/** Inactivity-gap sessionization semantics on crafted event streams, plus
  * the one-exchange plan shape (lag window, running-sum window, and the
  * (user, session) aggregate all reuse the user_id partitioning).
  */
class SessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap strictly over the threshold opens a session; ties never do") {
    val ev = Seq(
      // user 1: two sessions separated by exactly 2h + 1µs against a 2h gap
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 01:00:00"), 2.0),
      (1L, 12L, Timestamp.from(
        ts("2024-01-01 03:00:00").toInstant.plusNanos(1000)), 4.0),
      // user 2: equal timestamps (gap 0) stay one session
      (2L, 20L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, 21L, ts("2024-01-01 00:00:00"), 20.0),
      // boundary case: a gap of EXACTLY the threshold is not an opener
      (3L, 30L, ts("2024-01-01 00:00:00"), 1.0),
      (3L, 31L, ts("2024-01-01 02:00:00"), 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Sessions.sessionize(ev, gapSeconds = 7200L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    assert(got === Map(
      (1L, 1L) -> ((2L, 300L)),  // events 10+11, 100+200 cents
      (1L, 2L) -> ((1L, 400L)),  // event 12 alone (gap > threshold)
      (2L, 1L) -> ((2L, 3000L)), // simultaneous events, one session
      (3L, 1L) -> ((2L, 200L)))) // gap == threshold stays inside
  }

  test("native session_window merges at EXACTLY the gap; splits one µs past it") {
    // Spark merges sessions whose [start, last+gap] ranges TOUCH — an
    // event landing exactly on the previous end joins the session. The
    // half-open reading (exact gap splits) is wrong, and this pin is what
    // licenses the e15 oracle's `diff > gap` boundary arithmetic.
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0), // exact 1h gap: merges
      (1L, 11L, ts("2024-01-01 01:00:00"), 2.0),
      (2L, 20L, ts("2024-01-01 00:00:00"), 1.0), // 1h + 1µs: splits
      (2L, 21L, Timestamp.from(
        ts("2024-01-01 01:00:00").toInstant.plusNanos(1000)), 2.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Sessions.nativeSessionWindows(ev, "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val us = (s: String) => ts(s).toInstant.toEpochMilli * 1000L
    assert(got === Map(
      // one merged session; END extends to last event + gap
      (1L, us("2024-01-01 00:00:00")) ->
        ((us("2024-01-01 02:00:00"), 2L, 300L)),
      (2L, us("2024-01-01 00:00:00")) ->
        ((us("2024-01-01 01:00:00"), 1L, 100L)),
      (2L, us("2024-01-01 01:00:00") + 1L) ->
        ((us("2024-01-01 02:00:00") + 1L, 1L, 200L))))
    // same boundary convention as the hand-rolled sessionize (diff <= gap
    // merges): the two operators agree, by construction AND by witness
    val legacy = Sessions.sessionize(ev, gapSeconds = 3600L).collect()
    assert(legacy.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 1L), (2L, 1L), (2L, 2L)))
  }

  test("sessionize plans ONE exchange: windows and agg share user_id partitioning") {
    val out = Sessions.sessionize(Tables.events(spark, sf0001))
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nExchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
    val nWindows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(nWindows <= 2)
    assert(out.count() > 0)
  }

  test("funnel: order matters — a purchase before the first view never converts") {
    import spark.implicits._
    def ev(rows: (Long, String, Long)*) = rows.map { case (u, t, sec) =>
      (u, t, new java.sql.Timestamp(sec * 1000L))
    }.toDF("user_id", "event_type", "ts")
    val events = ev(
      (1L, "view", 10), (1L, "click", 20), (1L, "purchase", 30), // full path
      (2L, "purchase", 5), (2L, "view", 10), (2L, "click", 20),  // wrong order: stops at click
      (3L, "click", 5), (3L, "view", 10),                        // click precedes view: stops at view
      (4L, "view", 10), (4L, "click", 10), (4L, "purchase", 10), // simultaneous: >= admits all
      (5L, "error", 10))                                         // never enters
    val got = Sessions.funnel(events)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "view", 4L, 1000L),
      (2, "click", 3L, 750L),
      (3, "purchase", 2L, 500L)))
  }

  test("funnel plans ONE exchange across its three chained windows") {
    val out = Sessions.funnel(Tables.events(spark, sf0001))
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nExchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
    assert(out.count() === 3)
  }

  test("attribution: last click wins, lookback bounds, same-instant click counts") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: click(id2)@10, click(id3)@20, purchase(id4)@30 → click 3, gap 10m
      (2L, ts(10), 1L, "click"), (3L, ts(20), 1L, "click"),
      (4L, ts(30), 1L, "purchase"),
      // user 2: click@0, purchase@90 → outside 1h lookback → organic (nulls)
      (5L, ts(0), 2L, "click"), (6L, ts(90), 2L, "purchase"),
      // user 3: same-instant click and purchase → attributable, gap 0
      (7L, ts(5), 3L, "click"), (8L, ts(5), 3L, "purchase"),
      // user 4: purchase with no click ever → organic
      (9L, ts(1), 4L, "purchase"),
      // a later click never attributes an EARLIER purchase
      (10L, ts(2), 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.lastTouchAttribution(ev)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got === Seq(
      (4L, Some(3L), Some(10L * 60000000L)),
      (6L, None, None),
      (8L, Some(7L), Some(0L)),
      (9L, None, None)))
    // one keyed exchange total — merged-stream carry, no self-join
    val plan = Sessions.lastTouchAttribution(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"attribution must not join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"expected 1 hash exchange:\n$plan")
  }

  test("session-incident overlap joins broadcast-NL and counts touched hours") {
    val out = Sessions.sessionIncidentOverlap(Tables.events(spark, sf001))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"metadata-scale incident side must broadcast:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // boundary semantics: a bar starting exactly at end_us still overlaps
    // (inclusive end), one starting at end_us+1h does not — proven via a
    // literal frame where both cases are constructed
    val h = 3600000000L
    // 4 events in hour 0 for type "a" (mean will be ~1 across 3 bars),
    // user session spans exactly [0, h) so bar 0 overlaps, bar 2h not
    val ev = (0 until 4).map(i => (i.toLong, i * 1000L, 1L, "a", 1.0)) ++
      Seq((10L, 2 * h + 1, 2L, "a", 1.0), (11L, 3 * h + 2, 2L, "a", 1.0))
    val df = ev.toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Sessions.sessionIncidentOverlap(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // bars: h0 n=4, h2 n=1, h3 n=1 → target = 2, incident iff 4n ≥ 14 → h0
    assert(got((1L, 1L)) === 1L, "user 1's session touches the hot hour")
    assert(got((2L, 1L)) === 0L, "user 2's session avoids it entirely")
  }

  test("patternMatch: greedy non-overlapping V C* P, same-µs order by event_id") {
    // user 1 projects to "vccpvpevcp": matches vccp | vp | vcp → 3 paths,
    // 2 click-assisted, longest click run 2. Events 5 and 6 share a
    // timestamp — only the event_id tie-break puts 'v' before 'p' to
    // form the middle "vp" match.
    val types = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
      'e' -> "error", 's' -> "signup")
    val seq1 = "vccpvpevcp".zipWithIndex.map { case (ch, i) =>
      val us = if (i == 5) 4L else i.toLong // event 5 collides with event 4
      (i.toLong, Timestamp.from(
        ts("2024-01-01 00:00:00").toInstant.plusNanos(us * 60000000000L)),
        1L, types(ch))
    }
    // user 2: clicks without a leading view never match
    val seq2 = "ccpp".zipWithIndex.map { case (ch, i) =>
      (100L + i, Timestamp.from(
        ts("2024-01-01 00:00:00").toInstant.plusNanos(i * 60000000000L)),
        2L, types(ch))
    }
    val ev = (seq1 ++ seq2).toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.patternMatch(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((10L, 3L, 2L, 2L)))
    assert(got(2L) === ((4L, 0L, 0L, 0L)))
  }

  test("decayAttribution: floor shares, residual to most recent, full reconciliation") {
    val d = 86400000000L
    // user 1: purchase 10.00$ at t=2d; touches at ages 0/1/2 days
    // (weights 4/2/1, W=7) and one outside the 3-day lookback.
    // user 2: purchase 5.00$ with no touches → unattributed.
    val ev = Seq(
      (1L, 2 * d, 1L, "purchase", 10.0),
      (2L, 2 * d - 3600000000L, 1L, "click", 0.0), // age 0 → w 4
      (3L, 2 * d - d - 1L, 1L, "view", 0.0),       // age 1 → w 2
      (4L, -d / 2, 1L, "click", 0.0),              // age 2 → w 1
      (5L, -2 * d, 1L, "view", 0.0),               // outside lookback
      (6L, 9 * d, 2L, "purchase", 5.0))
    val df = ev.toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Sessions.decayAttribution(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // bases: 1000*4 div 7 = 571, 1000*2 div 7 = 285, 1000*1 div 7 = 142
    // assigned 998 → residual 2 to the age-0 click (most recent)
    assert(got("click") === ((2L, 573L + 142L)))
    assert(got("view") === ((1L, 285L)))
    assert(got("unattributed") === ((1L, 500L)))
  }

  test("decayAttribution: lookbackDays beyond the Long-shift bound is rejected") {
    val df = Seq((1L, 0L, 1L, "purchase", 1.0))
      .toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    intercept[IllegalArgumentException] {
      Sessions.decayAttribution(df, lookbackDays = 63)
    }
    intercept[IllegalArgumentException] {
      Sessions.decayAttribution(df, lookbackDays = 0)
    }
  }

  test("adoptionCurve: users count once on their first-seen day") {
    val d = 86400000000L
    val ev = Seq(
      (1L, 10L, 1L, "click", 0.0),         // A first seen day 0
      (2L, d + 10L, 1L, "view", 0.0),      // A again day 1 — not new
      (3L, d + 20L, 2L, "click", 0.0))     // B first seen day 1
    val df = ev.toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Sessions.adoptionCurve(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((1L, 1L, 1L)),
      1L -> ((2L, 1L, 2L))))
  }

  test("growthAccounting: new/retained/resurrected/churned ledger balances") {
    val w = 7L * 86400000000L
    // A: wk 0,1,2. B: wk 0, gone wk 1, back wk 2. C: wk 1 only.
    val ev = Seq((1L, 0L * w, 1L), (2L, 1L * w, 1L), (3L, 2L * w, 1L),
      (4L, 0L * w + 5L, 2L), (5L, 2L * w + 5L, 2L),
      (6L, 1L * w + 9L, 3L))
      .map { case (id, us, u) => (id, us, u, "click", 0.0) }
    val df = ev.toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Sessions.growthAccounting(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === Map(
      0L -> ((2L, 2L, 0L, 0L, 0L)),
      1L -> ((2L, 1L, 1L, 0L, 1L)), // B churns into wk 1
      2L -> ((2L, 0L, 1L, 1L, 1L)))) // B resurrects; C churns
    // ledger identity: active(w) = active(w-1) + new + res - churned
    assert(got(1L)._1 === got(0L)._1 + got(1L)._2 + got(1L)._4 - got(1L)._5)
    assert(got(2L)._1 === got(1L)._1 + got(2L)._2 + got(2L)._4 - got(2L)._5)
  }

  test("stickiness: sum of daily actives over 7x weekly actives, floor permille") {
    val d = 86400000000L
    // week 0: user 1 active 7/7 days, user 2 active 1 day →
    // dau_sum 8, wau 2 → 8000 div 14 = 571
    val ev = (0 until 7).map(i => (i.toLong, i * d + 1, 1L)) :+
      ((10L, 3 * d + 1, 2L))
    val df = ev.map { case (id, us, u) => (id, us, u, "click", 0.0) }
      .toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val r = Sessions.stickiness(df).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((8L, 2L, 571L)))
  }
}
