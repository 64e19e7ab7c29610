package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sessions, SetOps, TextOps, TimeSeries}

/** Round-8 additions: OHLC bars, interval coverage, trigram paths,
  * containment join, weighted systematic sampling, 2-D skyline.
  * Semantics on literal frames (referee = hand-computed or brute-force),
  * plan pins where the operator's reason-to-exist is a plan property.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(us: Long, id: Long, typ: String, value: Double,
      user: java.lang.Long = 1L) =
    (id, us, user, typ, value)

  private def eventsDf(rows: Seq[(Long, Long, java.lang.Long, String, Double)]) =
    rows.toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")

  test("ohlcBars: open/close follow (us, event_id) order, ties broken by id") {
    val h = 3600000000L
    val df = eventsDf(Seq(
      ev(10L, 5L, "click", 3.00), // same us as id=2: id order decides open
      ev(10L, 2L, "click", 1.00),
      ev(20L, 3L, "click", 9.00),
      ev(30L, 4L, "click", 2.00), // close
      ev(h + 1, 6L, "click", 7.00), // next bar
      ev(15L, 7L, "view", 5.00))) // other series
    val out = TimeSeries.ohlcBars(df, barUs = h).collect()
    assert(out.length === 3)
    val bar0 = out.find(r => r.getLong(0) == 0L && r.getString(1) == "click").get
    assert(bar0.getLong(2) === 100L, "open = cents of id=2 (tie on us, lower id)")
    assert(bar0.getLong(3) === 900L, "high")
    assert(bar0.getLong(4) === 100L, "low")
    assert(bar0.getLong(5) === 200L, "close = last by (us, id)")
    assert(bar0.getLong(6) === 4L)
    assert(bar0.getLong(7) === 100L + 300L + 900L + 200L)
  }

  test("ohlcBars plans a single hash aggregate, no window over the stream") {
    val df = eventsDf(Seq(ev(1L, 1L, "a", 1.0), ev(2L, 2L, "a", 2.0)))
    val plan = TimeSeries.ohlcBars(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no WindowExec expected:\n$plan")
  }

  test("intervalCoverage: touching intervals merge, gaps split islands") {
    val m30 = 1800000000L
    val df = eventsDf(Seq(
      ev(0L, 1L, "a", 0.0),          // island 1: [0, 30m)
      ev(m30, 2L, "a", 0.0),         // touches end=30m → same island, extends to 60m
      ev(3 * m30 + 1, 3L, "a", 0.0), // strictly past 60m → island 2
      ev(0L, 4L, "a", 0.0, 2L)))     // another user
    val out = TimeSeries.intervalCoverage(df, holdUs = m30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 2 * m30 + m30, 2 * m30)),
      "user 1: two islands, covered 60m+30m, longest 60m")
    assert(out(2L) === ((1L, m30, m30)))
  }

  test("intervalCoverage plans ONE hash exchange (windows + aggs share user_id)") {
    val df = Tables.events(spark, sf001)
    val plan = TimeSeries.intervalCoverage(df).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"expected 1 hash exchange:\n$plan")
  }

  test("trigramPaths: counts and distinct users on a literal stream") {
    val df = eventsDf(Seq(
      ev(1L, 1L, "a", 0.0), ev(2L, 2L, "b", 0.0), ev(3L, 3L, "c", 0.0),
      ev(4L, 4L, "b", 0.0), ev(5L, 5L, "c", 0.0), // user 1: abc, bcb, cbc? no: abc,bcb,cbc
      ev(1L, 6L, "a", 0.0, 2L), ev(2L, 7L, "b", 0.0, 2L), ev(3L, 8L, "c", 0.0, 2L)))
    val out = Sessions.trigramPaths(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", "b", "c")) === ((2L, 2L)), "abc walked once by each user")
    assert(out(("b", "c", "b")) === ((1L, 1L)))
    assert(out(("c", "b", "c")) === ((1L, 1L)))
    assert(out.size === 3)
  }

  test("containmentJoin finds asymmetric containment that Jaccard misses") {
    // doc 1 = 6 tokens (4 shingles), doc 2 = doc 1 + 12 tokens of suffix:
    // containment(1 in 2) = 1, Jaccard ≈ 4/16 — far below any threshold
    val small = "w1 w2 w3 w4 w5 w6"
    val big = small + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    val docs = Seq((1L, small), (2L, big), (3L, "unrelated text here entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentJoin(docs, 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)), "only small-in-big, directed")
    val jac = Dedup.prefixFilterJoin(docs, 4, 5).collect()
    assert(jac.isEmpty, "symmetric Jaccard at 0.8 must NOT find the pair")
  }

  test("containmentJoin equals brute force on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0 until 40).map { i =>
      val n = 4 + rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    import graft.functions.TextFunctions.shingles3
    val sets = docs.select(col("doc_id"),
        array_distinct(shingles3(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expect = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && (sa & sb).size * 5L >= sa.size * 4L
    } yield (a, b)).toSet
    val got = Dedup.containmentJoin(docs, 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("weightedSample: exactly k hits per stratum, heavy rows hit more") {
    val df = Seq(
      ("s1", 1L, 1000L), ("s1", 2L, 1L), ("s1", 3L, 1L),
      ("s2", 4L, 10L), ("s2", 5L, 10L), ("s2", 6L, 10L), ("s2", 7L, 10L))
      .toDF("lang", "doc_id", "n_chars")
    val out = TextOps.weightedSample(df, "doc_id", "lang", "n_chars", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val hits = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(hits === Map("s1" -> 4L, "s2" -> 4L), "every stratum yields exactly k")
    val s1 = out.filter(_._1 == "s1")
    assert(s1.exists(r => r._2 == 1L && r._3 >= 3L),
      "the row with ~99.8% of the weight absorbs most grid points")
    val s2 = out.filter(_._1 == "s2").map(_._2).toSet
    assert(s2 === Set(4L, 5L, 6L, 7L), "equal weights, k=n → every row once")
  }

  test("weightedSample zero/negative weights are excluded, k=1 picks one") {
    val df = Seq(("s", 1L, 0L), ("s", 2L, 5L)).toDF("lang", "doc_id", "n_chars")
    val out = TextOps.weightedSample(df, "doc_id", "lang", "n_chars", 1).collect()
    assert(out.length === 1 && out.head.getLong(1) === 2L)
  }

  test("skyline2d equals brute-force dominance on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(i =>
      (i.toLong, 1.0 + rnd.nextInt(500) / 10.0, rnd.nextInt(40) + 1)) ++
      Seq((990L, 3.7, 39), (991L, 3.7, 39)) // exact duplicate pair
    val df = rows.toDF("p_partkey", "p_retailprice", "p_size")
    val pts = rows.map { case (k, p, s) => (k, math.round(p * 100), s.toLong) }
    val expect = pts.filter { case (_, c, sz) =>
      !pts.exists { case (_, c2, sz2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz) }
    }.map(_._1).toSet
    val got = SetOps.skyline2d(df, bucketCents = 700L)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.contains(990L) === got.contains(991L),
      "equal points survive or fall together")
  }

  test("segmentDedup keeps the globally-first copy and reconstructs in order") {
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")  // 8-token segment
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    val segC = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$segA $segB"),      // first occurrence of A and B
      (2L, s"$segC $segA"),      // C new; A is a later copy → dropped
      (3L, s"$segB $segB"))      // doc-internal repeat: second B dropped too
      .toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, segTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 2L, s"$segA $segB")))
    assert(out(2L) === ((2L, 1L, segC)), "later copy of A removed, order kept")
    assert(out(3L) === ((2L, 0L, "")),
      "every B here is a later copy; empty doc reconstructs to empty string")
  }

  test("segmentDedup: segTokens = 1 with degenerate docs does not crash") {
    // Defensive guard: a 0-size token array with segTokens = 1 would make
    // the segment-count bound (size - 1) div 1 = -1, and sequence(0, -1)
    // DESCENDS into slice(toks, 0, ..) — an ANSI-mode error. tokens()
    // itself never yields size 0 (split("", " ") = [""]), so the guard
    // keeps the invariant local rather than fixing a reachable crash.
    val docs = Seq((1L, ""), (2L, "x y")).toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, segTokens = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(2L) === "x y")
    assert(out.contains(1L))
  }

  test("skyline2d bucket pre-prune discards the bulk before the global window") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map(i =>
      (i.toLong, 1.0 + rnd.nextInt(900) / 10.0, rnd.nextInt(50) + 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
    // count rows surviving stage 1 by running the same prune standalone:
    // the exact skyline must be reproduced regardless of bucket width
    val wide = SetOps.skyline2d(df, bucketCents = 100000L).collect().map(_.getLong(0)).toSet
    val narrow = SetOps.skyline2d(df, bucketCents = 500L).collect().map(_.getLong(0)).toSet
    assert(wide === narrow, "bucket width is a performance knob, not semantics")
  }

  test("trendSlopes: hand-computed rational slope, degenerate series -> nulls") {
    val m = 60000000L // one minute in us
    val df = eventsDf(Seq(
      // user 1: (x, cents) = (0,100),(1,200),(2,300) — y = 100x + 100:
      //   n=3 sx=3 sy=600 sxx=5 sxy=800 -> den=6, slope 600/6, icept 600/6
      ev(0L, 1L, "a", 1.00, 1L),
      ev(m, 2L, "a", 2.00, 1L),
      ev(2 * m, 3L, "a", 3.00, 1L),
      // user 2: both events inside ONE minute -> x=0,0 -> den=0 -> nulls
      ev(0L, 4L, "a", 1.00, 2L),
      ev(30000000L, 5L, "a", 9.00, 2L),
      // user 3: group-relative origin — events at minutes 100,101 must
      // produce x=0,1, slope = y-diff in cents
      ev(100 * m, 6L, "a", 5.00, 3L),
      ev(101 * m, 7L, "a", 5.25, 3L)
    ))
    val got = TimeSeries.trendSlopes(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got(1L) === ((3L, Some(600L), Some(6L), Some(600L))))
    assert(got(2L) === ((2L, None, None, None)),
      "single-minute series must report n with null slope terms")
    // n=2 sx=1 sy=1025 sxx=1 sxy=525: den=1, slope 25/1, intercept 500/1
    assert(got(3L) === ((2L, Some(25L), Some(1L), Some(500L))),
      "origin must be group-relative (slope 25 cents/min)")
  }

  test("maxDrawdown: hand-computed peak-to-trough, earliest trough on ties") {
    val m = 60000000L
    val df = eventsDf(Seq(
      ev(0L, 1L, "a", 1.00), ev(m, 2L, "a", 3.00), ev(2 * m, 3L, "a", 1.50),
      ev(3 * m, 4L, "a", 2.50), ev(4 * m, 5L, "a", 0.50), ev(5 * m, 6L, "a", 2.00)
    ))
    // peaks 100,300,300,300,300,300 -> dd 0,0,150,50,250,100
    val r = TimeSeries.maxDrawdown(df).collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (("a", 250L, 300L, 6L, 4 * m)))
  }

  test("rsiBars: hand-computed permille, warm-up and flat windows null") {
    val m = 60000000L
    val df = eventsDf(Seq(
      ev(0L, 1L, "a", 1.00), ev(m, 2L, "a", 2.00),
      ev(2 * m, 3L, "a", 1.50), ev(3 * m, 4L, "a", 1.50)
    ))
    // 1-minute bars, period 2: deltas null,+100,-50,0 -> frames of 2:
    // bar2 g=100 l=50 -> 666; bar3 g=0 l=50 -> 0; bars 0,1 warm up
    val got = TimeSeries.rsiBars(df, period = 2, barUs = m).collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(got.toSeq === Seq(None, None, Some(666L), Some(0L)))
  }

  test("engulfingBars: planted pattern matches, near-miss (no engulf) doesn't") {
    val h = 3600000000L
    // bar0: red 300->100. bar1: green 100->300, engulfs (open<=prev_close,
    // close>=prev_open). bar2: red again. bar3: green 150->250 — up but
    // does NOT reach prev_open 300: near-miss, must not match.
    val df = eventsDf(Seq(
      ev(0L, 1L, "a", 3.00), ev(1L, 2L, "a", 1.00),            // bar0 red
      ev(h, 3L, "a", 1.00), ev(h + 1, 4L, "a", 3.00),          // bar1 engulf
      ev(2 * h, 5L, "a", 3.00), ev(2 * h + 1, 6L, "a", 1.50),  // bar2 red
      ev(3 * h, 7L, "a", 1.50), ev(3 * h + 1, 8L, "a", 2.50)   // bar3 near-miss
    ))
    val got = TimeSeries.engulfingBars(df).collect()
      .map(r => (r.getLong(1) / h, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq((1L, 300L, 100L, 100L, 300L)),
      s"only bar1 engulfs bar0: ${got.toSeq}")
  }

  test("trendSlopes plans ONE hash exchange (window min + agg share user_id)") {
    val df = Tables.events(spark, sf001)
    val plan = TimeSeries.trendSlopes(df).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"expected 1 hash exchange:\n$plan")
  }

  test("cusumChangepoint: locates the mean shift; |D| ties break to the earliest hour") {
    val H = 3600000000L
    val evs = eventsDf(Seq(
      // series x: 100,100,100 | 900,900,900 cents -> split after hour 2
      //   D_i = 6*S_i - i*3000: -2400,-4800,-7200,-4800,-2400 (max at i=3)
      ev(0 * H, 1, "x", 1.00), ev(1 * H, 2, "x", 1.00), ev(2 * H, 3, "x", 1.00),
      ev(3 * H, 4, "x", 9.00), ev(4 * H, 5, "x", 9.00), ev(5 * H, 6, "x", 9.00),
      // series y: 100,900,100,900 -> D = -1600, 0, -1600: |D| ties at
      // i=1 and i=3, the earlier hour must win
      ev(0 * H, 7, "y", 1.00), ev(1 * H, 8, "y", 9.00),
      ev(2 * H, 9, "y", 1.00), ev(3 * H, 10, "y", 9.00)))
    val out = TimeSeries.cusumChangepoint(evs)
      .select("event_type", "n_hours", "changepoint_us", "max_abs_d",
        "sum_before", "n_before", "sum_after", "n_after")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out(0) == (("x", 6L, 2 * H, 7200L, 300L, 3L, 2700L, 3L)))
    assert(out(1) == (("y", 4L, 0L, 1600L, 100L, 1L, 1900L, 3L)))
  }

  test("cusumChangepoint shares ONE series exchange across all four windows") {
    val df = Tables.events(spark, sf001)
    val plan = TimeSeries.cusumChangepoint(df)
      .queryExecution.executedPlan.toString
    // one exchange for the (series, hour) aggregate, one for the series
    // windows - the four window specs and the argmax rank must not add more
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"expected <=2 hash exchanges:\n$plan")
  }

  test("bollingerBreakouts: flat window never fires, a spike fires above only") {
    val h = 3600000000L
    // 20 flat hourly closes (var = 0, dev = 0: 0 > 0 is false, so even a
    // zero-variance window never flags its own level), then a spike bar.
    val rows = (0 until 20).map(i => ev(i * h, i + 1L, "click", 100.00)) :+
      ev(20L * h, 21L, "click", 200.00)
    val out = TimeSeries.bollingerBreakouts(eventsDf(rows), period = 20).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "click")
    assert(r.getLong(1) === 1L, "only the bar with a full 20-bar history evaluates")
    assert(r.getLong(2) === 1L, "spike breaks the upper band")
    assert(r.getLong(3) === 0L)
  }

  test("twap: duration weights, last observation carries no interval") {
    val df = eventsDf(Seq(
      ev(0L, 1L, "click", 1.00),   // holds 10us at 100c
      ev(10L, 2L, "click", 2.00),  // holds 20us at 200c
      ev(30L, 3L, "click", 9.99))) // no successor: dropped
    val r = TimeSeries.twap(df).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((2L, 30L, 100L * 10 + 200L * 20, (100L * 10 + 200L * 20) / 30)))
  }

  test("vwapBars: volume weighting from the JSON k field, zero-volume bar keeps a null vwap") {
    val df = Seq(
      (1L, 0L, "click", 1.00, """{"k": 2}"""),
      (2L, 10L, "click", 2.00, """{"k": 4}"""),
      (3L, 20L, "view", 5.00, """{"k": 0}"""))
      .toDF("event_id", "usl", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val out = TimeSeries.vwapBars(df).collect()
      .map(r => r.getString(1) -> r).toMap
    val click = out("click")
    assert(click.getLong(2) === 2L)
    assert(click.getLong(3) === 6L, "volume")
    assert(click.getLong(4) === 100L * 2 + 200L * 4, "notional")
    assert(click.getLong(5) === (100L * 2 + 200L * 4) / 6)
    assert(out("view").isNullAt(5), "zero-volume bar reports null vwap, not dropped")
  }

  test("peakDetection: strict interior maxima only; endpoints undecidable") {
    val h = 3600000000L
    // closes per hourly bar: 1, 3, 2, 2, 5  -> one peak (3), no trough
    // (the 2,2 plateau is not strict; 5 is an endpoint)
    val df = eventsDf(Seq(
      ev(0L * h, 1L, "click", 1.00), ev(1L * h, 2L, "click", 3.00),
      ev(2L * h, 3L, "click", 2.00), ev(3L * h, 4L, "click", 2.00),
      ev(4L * h, 5L, "click", 5.00)))
    val r = TimeSeries.peakDetection(df).collect().head
    assert(r.getLong(1) === 5L, "n_bars")
    assert(r.getLong(2) === 3L, "interior bars")
    assert(r.getLong(3) === 1L, "single strict peak")
    assert(r.getLong(4) === 0L, "plateau is not a strict trough")
    assert(r.getLong(5) === 300L, "peak close in cents")
    assert(r.getLong(6) === 1L, "peak bar index")
  }

  test("streaks: longest rising and falling step runs, plateau breaks both") {
    import graft.operators.WindowOps
    val vals = Seq(1.00, 2.00, 3.00, 2.50, 2.40, 2.30, 2.30)
    val df = eventsDf(vals.zipWithIndex.map { case (v, i) =>
      ev(i * 10L, i + 1L, "click", v, 7L)
    })
    val r = WindowOps.streaks(df).collect().head
    assert(r.getLong(0) === 7L, "user_id")
    assert(r.getLong(1) === 7L, "n_events")
    assert(r.getLong(2) === 2L, "1->2->3 is two rising steps")
    assert(r.getLong(3) === 3L, "3->2.5->2.4->2.3 is three falling steps; plateau ends it")
  }

  test("resetRunningTotal: fold resets at the threshold, boundary inclusive") {
    val df = eventsDf(Seq(
      // user 1: 6000+5000 -> reset; 2000+9000 -> reset; 500 residual
      ev(1L, 1L, "purchase", 60.00), ev(2L, 2L, "purchase", 50.00),
      ev(3L, 3L, "purchase", 20.00), ev(4L, 4L, "purchase", 90.00),
      ev(5L, 5L, "purchase", 5.00),
      // clicks never participate
      ev(6L, 6L, "click", 999.99),
      // user 2: EXACTLY the threshold resets (>=, not >)
      ev(1L, 7L, "purchase", 100.00, 2L)
    ))
    val got = TimeSeries.resetRunningTotal(df, thresholdCents = 10000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((5L, 2L, 500L)))
    assert(got(2L) === ((1L, 1L, 0L)))
  }

  test("busdayLag: weekend days never count, closed-form g() is exact") {
    // 2024-01-05 Friday, 2024-01-06 Saturday, 2024-01-08 Monday
    val orders = Seq(
      (1L, "A", java.sql.Date.valueOf("2024-01-05")), // Fri -> Mon = 1
      (2L, "B", java.sql.Date.valueOf("2024-01-06")), // Sat -> Mon = 0
      (3L, "C", java.sql.Date.valueOf("2024-01-05"))  // Fri -> Fri = 0
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, java.sql.Date.valueOf("2024-01-08")),
      (2L, java.sql.Date.valueOf("2024-01-08")),
      (3L, java.sql.Date.valueOf("2024-01-05"))
    ).toDF("l_orderkey", "l_shipdate")
    val got = TimeSeries.busdayLag(orders, li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("A" -> 1L, "B" -> 0L, "C" -> 0L))
  }

  test("autocorrelation: exact quotients on an alternating series, same-day orders pre-summed") {
    // days 0..3 with daily dollars 10,20,10,20 (day 0 arrives as 4+6):
    // mu = 60 div 4 = 15, d = (-5, 5, -5, 5), den = 100
    val orders = Seq(
      (1L, java.sql.Date.valueOf("1970-01-01"), 4.0),
      (2L, java.sql.Date.valueOf("1970-01-01"), 6.0),
      (3L, java.sql.Date.valueOf("1970-01-02"), 20.0),
      (4L, java.sql.Date.valueOf("1970-01-03"), 10.0),
      (5L, java.sql.Date.valueOf("1970-01-04"), 20.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = TimeSeries.autocorrelation(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, -750L, -750000L)),
      "lag 1: num -75, den 100 -> -750 permille")
    assert(got(2L) === ((2L, 500L, 500000L)), "lag 2: num +50")
    assert(got(3L) === ((1L, -250L, -250000L)))
    assert(!got.contains(4L), "no day pairs 4 apart -> lag absent, not zero")
  }

  test("autocorrelation: lag pairing is by calendar day, floor mean is exact") {
    // days 0, 1, 3 (day 2 missing): mu = 40 div 3 = 13, d = (-3, 7, -3)
    val orders = Seq(
      (1L, java.sql.Date.valueOf("1970-01-01"), 10.0),
      (2L, java.sql.Date.valueOf("1970-01-02"), 20.0),
      (3L, java.sql.Date.valueOf("1970-01-04"), 10.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = TimeSeries.autocorrelation(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // -21000 div 67 TRUNCATES toward zero (-313, not floor -314) — the
    // engine-semantics case the permille columns must pin
    assert(got(1L) === ((1L, -313L, -313432L)), "only (day0, day1) is 1 apart")
    assert(got(2L) === ((1L, -313L, -313432L)),
      "(day1, day3) pairs at lag 2, not lag 1")
    assert(got(3L) === ((1L, 134L, 134328L)))
  }

  test("autocorrelation: maxLag = 0 is rejected (sequence(1, 0) descends)") {
    val orders = Seq((1L, java.sql.Date.valueOf("1970-01-01"), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    intercept[IllegalArgumentException] {
      TimeSeries.autocorrelation(orders, maxLag = 0)
    }
  }

  test("ewma: power-of-two weights, calendar gaps renormalize wt_den") {
    // days 0, 1, 3 (gap at day 2), horizon 3 → weights 4, 2, 1 by age.
    val df = Seq(("1970-01-01", 100.0), ("1970-01-02", 200.0),
        ("1970-01-04", 400.0))
      .toDF("d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val got = TimeSeries.ewma(df, horizon = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(0L) === ((1L, 400L, 4L)), "day 0: itself only, w=4")
    assert(got(1L) === ((2L, 2 * 400L + 100L * 2L, 6L)),
      "day 1: w4*200 + w2*100, den 6")
    assert(got(3L) === ((2L, 4 * 400L + 1 * 200L, 5L)),
      "day 3: gap day 2 drops its term from num AND den")
  }

  test("kaplanMeier: risk set counts all observed times >= t, censored rows never emit") {
    // Horizon = day 400 (customer E). Tenures: A=10 churned (390 > 365
    // since last), B=380 censored (20 days), C=0 censored, D=0 churned,
    // E=0 censored.
    val df = Seq(
      ("A", "1970-01-01"), ("A", "1970-01-11"),
      ("B", "1970-01-01"), ("B", "1971-01-16"),
      ("C", "1971-01-31"),
      ("D", "1970-01-01"),
      ("E", "1971-02-05"))
      .toDF("o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("date"))
    val got = TimeSeries.kaplanMeier(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((5L, 1L, 2L)), // all 5 at risk; D churns; C,E censored here
      10L -> ((2L, 1L, 0L)) // A and B still at risk; A churns
    ), "censored-only times (t=380) emit no row")
  }

  test("linearInterp: exact rational fill between brackets, edges never emit") {
    // days 0 (100$) and 3 (400$): gap days 1 and 2 interpolate at
    // thirds; no row for the present days and nothing beyond the span.
    val df = Seq(("1970-01-01", 100.0), ("1970-01-04", 400.0))
      .toDF("d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val got = TimeSeries.linearInterp(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      1L -> ((0L, 3L, 100L * 2 + 400L * 1, 3L)), // 600/3 = 200
      2L -> ((0L, 3L, 100L * 1 + 400L * 2, 3L))  // 900/3 = 300
    ))
  }

  test("ltvTriangle: cohort age is relative to FIRST order, cumulative per cohort") {
    // cust A first orders week 0 (10$), buys again week 1 (20$);
    // cust B joins the same cohort week 0 (40$) and goes quiet.
    val df = Seq(
      ("A", "1970-01-01", 10.0), ("A", "1970-01-09", 20.0),
      ("B", "1970-01-02", 40.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val got = TimeSeries.ltvTriangle(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 5000L, 5000L, 2L, 2500L)),
      (0L, 1L) -> ((1L, 2000L, 7000L, 2L, 3500L))))
  }

  test("revenueRecognition: floor shares with last-day residual, zero drift") {
    // day 0 books 305c over 3 days → 101, 101, 103; day 1 books 300c
    // → 100 to days 1-3. Every cent recognized exactly once.
    val df = Seq(("1970-01-01", 3.05), ("1970-01-02", 3.00))
      .toDF("d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val got = TimeSeries.revenueRecognition(df, spreadDays = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((1L, 101L)), 1L -> ((2L, 201L)),
      2L -> ((2L, 203L)), 3L -> ((1L, 100L))))
    assert(got.values.map(_._2).sum === 605L, "reconciles to bookings")
  }

  test("dailyPercentiles: discrete order statistics per day, no interpolation") {
    // one day, cents 1..100: k_p = 99p div 100 + 1 → P50=50, P90=90, P99=99
    val df = (1 to 100).map(i => (i.toLong, i.toLong * 1000L, i / 100.0))
      .toDF("event_id", "usl", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val r = TimeSeries.dailyPercentiles(df).collect().head
    assert(r.getLong(1) === 100L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((50L, 90L, 99L)))
  }

  test("openOrderBacklog: delta stream opens on placement, closes after last ship") {
    val orders = Seq((1L, "1970-01-01"), (2L, "1970-01-02"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", col("d").cast("date"))
    val li = Seq((1L, "1970-01-02"), (1L, "1970-01-03"), (2L, "1970-01-02"))
      .toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", col("sd").cast("date"))
    val got = TimeSeries.openOrderBacklog(orders, li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((1L, 0L, 1L)), // order 1 opens
      1L -> ((1L, 0L, 2L)), // order 2 opens
      2L -> ((0L, 1L, 1L)), // order 2 closed (last ship day 1)
      3L -> ((0L, 1L, 0L)))) // order 1 closed (last ship day 2)
  }

  test("fiscalCalendar: 4-4-5 period boundaries from pure week arithmetic") {
    val days = Seq(0, 27, 28, 56, 91, 364) // wk 0, 3, 4, 8, 13, 52
    val df = days.map(d => (d, 1.0)).toDF("i", "o_totalprice")
      .withColumn("o_orderdate",
        date_add(lit("1992-01-01").cast("date"), col("i")))
    val got = TimeSeries.fiscalCalendar(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 1L) -> 2L, // weeks 0 and 3 land in period 1
      (0L, 2L) -> 1L, // week 4 opens period 2
      (0L, 3L) -> 1L, // week 8 opens period 3 (the 5-week month)
      (0L, 4L) -> 1L, // week 13 opens Q2
      (1L, 1L) -> 1L)) // week 52 rolls the fiscal year
  }

  test("vocabGrowth: bigrams bin to their first-seen checkpoint, curve accumulates") {
    val df = Seq(
      (10L, "x y z"),  // bigrams "x y", "y z" → checkpoint 50
      (60L, "x y w"),  // "x y" seen; "y w" new → checkpoint 100
      (300L, "q r"))   // "q r" new → checkpoint 500
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      50L -> ((2L, 2L)), 100L -> ((1L, 3L)), 500L -> ((1L, 4L))))
  }

  test("vocabGrowth: 0/1-token docs contribute no bigrams and do not crash") {
    // Regression: sequence(1, 0) DESCENDS in Spark, so an unguarded
    // bigram transform read toks[-1]/toks[1] — an ANSI-mode
    // INVALID_ARRAY_INDEX crash on short docs.
    val df = Seq(
      (10L, "solo"),     // 1 token: no bigram
      (20L, ""),         // 0 tokens: no bigram
      (30L, "a b"))      // 1 bigram → checkpoint 50
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(50L -> ((1L, 1L))))
  }

  test("weekdayAnova: floor-mean SSB/SST, perfect weekday structure scores 1000") {
    // 14 days: every dow-0 day books 70$, the rest 0 → group means
    // explain ALL variance under the floor-mean definition.
    val df = (0 until 14)
      .map(d => (d, if (d % 7 == 0) 70.0 else 0.0))
      .toDF("i", "o_totalprice")
      .withColumn("o_orderdate",
        date_add(lit("1970-01-01").cast("date"), col("i")))
    val r = TimeSeries.weekdayAnova(df).collect().head
    assert(r.getLong(0) === 14L, "n_days")
    // grand floor mean 10: SST = 2*60² + 12*10² = 8400 = SSB exactly,
    // so both quotients sit at their upper bounds
    assert(r.getLong(1) === 1000L, "eta2 permille")
    assert(r.getLong(2) === 1000000L, "eta2 ppm")
  }

  test("weekdayAnova: within-group variance lands between the bounds") {
    // dow-0 books 40 then 20 (within-group spread), the rest 0.
    // μ̂ = 60 div 14 = 4; SST = 36² + 16² + 12·4² = 1744;
    // SSB = 2·(30−4)² + 12·(0−4)² = 1544.
    val df = (0 until 14)
      .map(d => (d, if (d == 0) 40.0 else if (d == 7) 20.0 else 0.0))
      .toDF("i", "o_totalprice")
      .withColumn("o_orderdate",
        date_add(lit("1970-01-01").cast("date"), col("i")))
    val r = TimeSeries.weekdayAnova(df).collect().head
    assert(r.getLong(0) === 14L, "n_days")
    assert(r.getLong(1) === 1544L * 1000L / 1744L, "eta2 permille")
    assert(r.getLong(2) === 1544L * 1000000L / 1744L, "eta2 ppm")
  }
}
