package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, TextOps}

/** Data-quality tier semantics on crafted frames: profile null/distinct
  * accounting, expectation violation counts, incremental-agg merge
  * algebra, and positional phrase search.
  */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts, min/max per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (1.0, 2.0), (3.0, null), (null, 4.0))
      .toDF("a", "b")
    val got = Quality.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.get(4), r.get(5))).toMap
    assert(got("a") === ((4L, 1L, 2L, 1.0, 3.0)))
    assert(got("b") === ((4L, 2L, 2L, 2.0, 4.0)))
  }

  test("profile and expectations treat hostile names as data, not syntax") {
    // a column/rule name carrying quote, comma, and backtick must neither
    // break the expression nor inject into it (round-5 advice finding)
    val weird = "a'b,`c"
    val df = Seq(1.0, 2.0).toDF(weird)
    val prof = Quality.profile(df, Seq(weird)).collect()
    assert(prof.length === 1 && prof.head.getString(0) === weird)
    assert(prof.head.getLong(1) === 2L)
    val exp = Quality.expectations(df, Seq(weird -> (col("`a'b,``c`") > 0)))
      .collect()
    assert(exp.length === 1 && exp.head.getString(0) === weird)
    assert(exp.head.getLong(1) === 2L && exp.head.getLong(2) === 0L)
  }

  test("expectations reports per-rule violation counts from one scan") {
    val df = Seq(1, 2, 3, -4, 5).toDF("x")
    val got = Quality.expectations(df, Seq(
      "positive" -> (col("x") > 0),
      "under_3" -> (col("x") <= 3)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("positive") === ((5L, 1L)))
    assert(got("under_3") === ((5L, 1L))) // only x=5 violates; -4 <= 3 passes
  }

  test("mergeAggSnapshot is exact over disjoint, overlapping, and missing keys") {
    val snap = Seq(("a", 2L, 100L), ("b", 1L, 50L)).toDF("k", "cnt", "total")
    val delta = Seq(("b", 3L, 7L), ("c", 1L, 9L)).toDF("k", "cnt", "total")
    val got = Quality.mergeAggSnapshot(snap, delta, Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("a" -> ((2L, 100L)), "b" -> ((4L, 57L)), "c" -> ((1L, 9L))))
  }

  test("incremental contract holds on the fixture (split-merge == one-shot)") {
    val out = Quality.incrementalAggContract(Tables.events(spark, sf0001))
    assert(out.collect().forall(_.getBoolean(3)))
  }

  test("outlier gate: exact 1/64 band bounds, counts, and kept extrema") {
    // 64 rows at whole-dollar cents 100, 200, ..., 6400:
    // p(1/64) index = 63/64 -> 100 + 0.984375*100 = 198.4375 -> ceil 199
    // p(63/64) index = 62 + 1/64 -> 6300 + 0.015625*100 = 6301.5625 -> floor 6301
    val li = (1 to 64).map(i => ("A", i.toDouble)).toDF("l_returnflag", "l_extendedprice")
    val r = Quality.outlierGate(li).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 64L)           // n_rows
    assert(r.head.getLong(2) === 1L, "one low outlier (100)")
    assert(r.head.getLong(3) === 1L, "one high outlier (6400)")
    assert(r.head.getLong(4) === 200L && r.head.getLong(5) === 6300L)
    // plan pin: the positional-histogram rewrite must keep the whole gate
    // codegen'd — the interpreted ObjectHashAggregate `percentile` it
    // replaced was the suite's 4.5 s floor
    val plan = Quality.outlierGate(li).queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"interpreted percentile crept back into:\n$plan")
    assert(plan.contains("Window"), s"expected cumsum Window in:\n$plan")
  }

  test("source caps keep the lowest doc_ids and plan as WindowGroupLimit") {
    val docs = Seq(
      (5L, "s1", "en", 10L), (1L, "s1", "en", 10L), (3L, "s1", "en", 10L),
      (2L, "s2", "en", 10L), (9L, "s2", "en", 10L)
    ).toDF("doc_id", "source", "lang", "n_chars")
    val out = TextOps.sourceCaps(docs, 2)
    val kept = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.toSeq === Seq(("s1", 1L), ("s1", 3L), ("s2", 2L), ("s2", 9L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("oov rate against the top-k vocabulary, ties broken by term") {
    // df: each term appears in exactly one doc -> all tie at 1; the
    // vocab of size 2 must be the lexicographically first terms (a, b)
    val docs = Seq((1L, "a a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = TextOps.oovRate(docs, 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(got(1L) === ((3, 0, 0L)))
    assert(got(2L) === ((2, 2, 1000L)))
  }

  test("integrity audit counts fk orphans and pk duplicates exactly") {
    val parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")
    val child = Seq((1L, 10), (1L, 11), (9L, 12), (8L, 13)).toDF("fk", "y")
    val fk = Quality.fkOrphans("child->parent", child, "fk", parent, "pk").collect().head
    assert(fk.getString(0) === "child->parent")
    assert(fk.getLong(1) === 4L && fk.getLong(2) === 2L, "rows 9L and 8L are orphans")
    val dupped = parent.union(Seq((2L, "b2"), (2L, "b3")).toDF("pk", "x"))
    val pk = Quality.pkDuplicates("parent unique", dupped, "pk").collect().head
    assert(pk.getLong(1) === 4L && pk.getLong(2) === 2L, "two extra rows for key 2")
    // the fixture star schema must audit clean
    val audit = Quality.integrityAudit(Tables.lineitem(spark, sf0001),
      Tables.orders(spark, sf0001), Tables.customer(spark, sf0001)).collect()
    assert(audit.length === 4)
    assert(audit.forall(_.getLong(2) === 0L), "fixture constraints must hold")
  }

  test("chunking: full coverage, exact overlap, short-doc and tail cases") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens, k=4 s=3
      (2L, "a b"),                                    // shorter than one chunk
      (3L, "x y z q")                                 // exactly one chunk
    ).toDF("doc_id", "text")
    val got = TextOps.chunkWithOverlap(docs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    // doc 1: starts at tokens 1,4,7 -> 3 chunks; the last full window
    // reaches the end, so no redundant 1-token tail chunk is emitted
    assert(got((1L, 0L)) === "w1 w2 w3 w4")
    assert(got((1L, 1L)) === "w4 w5 w6 w7", "consecutive chunks overlap by k-s")
    assert(got((1L, 2L)) === "w7 w8 w9 w10")
    assert(got((2L, 0L)) === "a b")
    assert(got((3L, 0L)) === "x y z q")
    assert(got.size === 5)
    // coverage: every token of doc 1 appears in some chunk
    val covered = got.collect { case ((1L, _), txt) => txt.split(" ") }.flatten.toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("erasure: rewrite drops exactly the requested subjects, audit proves it") {
    val data = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val requests = Seq(1L, 9L).toDF("k")
    val erased = Quality.eraseKeys(data, "k", requests)
    assert(erased.collect().map(_.getLong(0)).toSet === Set(2L, 3L))
    val audit = Quality.erasureAudit(data, "k", requests)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(audit === Map(1L -> ((2L, true)), 9L -> ((0L, false))))
    // conservation: removed + surviving == original
    assert(audit.values.map(_._1).sum + erased.count() === data.count())
  }

  test("skew report ranks heavy keys with per-mille ratio to the mean group") {
    val rows = (Seq.fill(10)("hot") ++ Seq("a", "b")).map(k => (k, 1)).toDF("k", "v")
    val out = Quality.skewReport(rows, "k", topK = 2)
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // mean group = 12/3 = 4 rows; hot is 10/4 = 2.5x mean
    assert(got.head === (("hot", 10L, 12L, 3L, 2500L)))
    assert(got(1) === (("a", 1L, 12L, 3L, 250L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must heap, not sort:\n$plan")
  }

  test("split contract: covering partition on unique keys, flagged on dup keys") {
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val ok = TextOps.splitContract(docs).collect()
    assert(ok.map(_.getString(0)).toSeq === Seq("test", "train", "val"))
    assert(ok.forall(_.getBoolean(3)), "unique keys must satisfy the contract")
    assert(ok.forall(_.getBoolean(4)))
    assert(ok.map(_.getLong(1)).sum === 200L)
    // a duplicated key breaks covers_and_disjoint (rows > distinct keys)
    val dup = TextOps.splitContract(docs.union(docs.limit(1))).collect()
    assert(dup.forall(!_.getBoolean(3)), "dup keys must flip the contract")
    // an EMPTY split still emits its row, with nonempty = false (the
    // outer join against the literal split list makes absence visible)
    val empty = TextOps.splitContract(
      docs.filter(TextOps.hexNibble("doc_id") < 14), 14, 1).collect()
    assert(empty.length === 3)
    val byName = empty.map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(byName("val") === ((0L, false)) && byName("test") === ((0L, false)))
    assert(empty.forall(_.getBoolean(3)), "empty splits still cover the corpus")
  }

  test("phrase search finds exact adjacent pairs with occurrence counts") {
    val docs = Seq(
      (1L, "order fast order fast slow"), // 2 occurrences
      (2L, "fast order"),                 // reversed - no match
      (3L, "order slow fast"),            // not adjacent - no match
      (4L, "order fast")                  // 1 occurrence
    ).toDF("doc_id", "text")
    val got = TextOps.phraseSearch(docs, "order", "fast")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 4L -> 1L))
  }

  test("rate anomalies: median/MAD flags the spike hour, lower medians exact") {
    // type "a", 5 hours with counts 2,2,2,3,100: med=2 (rank 2 of 0..4),
    // devs sorted 0,0,0,1,98 -> MAD=0, so hours with n != 2 are anomalous
    // (dev > 3*0): the count-3 hour AND the spike. Type "b", 4 hours with
    // counts 1,2,3,4: LOWER median picks rank (4-1)/2=1 -> med=2; devs
    // sorted 0,1,1,2 -> MAD=1; anomalous iff dev > 3: none.
    def rows(tpe: String, perHour: Seq[Int]) = perHour.zipWithIndex.flatMap {
      case (n, h) => Seq.fill(n)((new java.sql.Timestamp(
        (1700000000L / 3600 * 3600 + h * 3600L) * 1000L), tpe))
    }
    val events = (rows("a", Seq(2, 2, 2, 3, 100)) ++ rows("b", Seq(1, 2, 3, 4)))
      .toDF("ts", "event_type")
    val got = Quality.rateAnomalies(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      "a" -> ((5L, 2L, 0L, 2L)),
      "b" -> ((4L, 2L, 1L, 0L))))
  }

  test("k-anonymity audit: only under-k groups emitted, with sizes") {
    val rows = Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq(("DE", "A"))
    val got = Quality.kAnonymityAudit(rows.toDF("country", "segment"),
      Seq("country", "segment"), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("DE", "A", 1L), ("US", "B", 2L)),
      "the k-sized group is compliant; smaller ones are the worklist")
    intercept[IllegalArgumentException](
      Quality.kAnonymityAudit(rows.toDF("country", "segment"), Seq(), 5))
    intercept[IllegalArgumentException](
      Quality.kAnonymityAudit(rows.toDF("country", "segment"),
        Seq("country"), 1))
  }

  test("l-diversity audit: homogeneous group flagged even though k-large") {
    // US group: 5 rows but only ONE distinct salary band -> homogeneity
    // leak; DE group: 3 rows across 3 bands -> diverse enough
    val rows = Seq.fill(5)(("US", 1000L)) ++
      Seq(("DE", 1000L), ("DE", 2000L), ("DE", 3000L))
    val got = Quality.lDiversityAudit(rows.toDF("country", "band"),
      Seq("country"), "band", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("US", 5L, 1L)))
  }

  test("hampel: spike flagged against rolling median, flat-frame degenerate") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(min * 60000L)
    // user 1: steady 10.00 with one 100.00 spike — only the spike flags
    // (frames: meds stay 1000, mad 0 → spike deviates 9000 > 0).
    // user 2: strictly increasing ramp — deviations stay within 3·MAD.
    val rows = (1 to 7).map(i => (i.toLong, ts(i), 1L,
        if (i == 5) 100.0 else 10.0)) ++
      (1 to 7).map(i => (10L + i, ts(i), 2L, i * 1.0))
    val got = Quality.hampelOutliers(rows.toDF("event_id", "ts", "user_id", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((5L, 10000L, 1000L, 0L)),
      s"only the spike flags: ${got.toSeq}")
  }

  test("lateness audit: disorder vs the running high-water mark, per type") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(min * 60000L)
    // type A arrives (by event_id) at minutes 0, 60, 30, 120:
    //   id 3 (min 30) trails the mark (60) by 30 min; others on time.
    // type B arrives at 0, 120, 0: id 6 trails by 120 min.
    val rows = Seq(
      (1L, ts(0), "A"), (2L, ts(60), "A"), (3L, ts(30), "A"), (4L, ts(120), "A"),
      (5L, ts(0), "B"), (6L, ts(120), "B"), (7L, ts(0), "B")
    ).toDF("event_id", "ts", "event_type")
    // delay 45 min: only B's 120-min straggler counts as late
    val got = Quality.latenessAudit(rows, delayUs = 45L * 60000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("A", 4L, 0L, 30L * 60000000L),
      ("B", 3L, 1L, 120L * 60000000L)))
    // delay 20 min: A's 30-min straggler is late too
    val tight = Quality.latenessAudit(rows, delayUs = 20L * 60000000L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(tight === Map("A" -> 1L, "B" -> 1L))
  }

  test("benford digits come from integer cents, not float rendering") {
    // 1.23 → 123 → 1; 0.05 → 5 → 5; 99.996 rounds to 10000 → 1 (the
    // round-then-extract order matters); 2.00 → 200 → 2; zero/null drop
    val rows = Seq(Some(1.23), Some(0.05), Some(99.996), Some(2.00),
      Some(0.0), None).toDF("o_totalprice")
    val got = Quality.benfordDigits(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 500L, 301L), // 2 of 4 → ⌊2000/4⌋ = 500 permille
      (2L, 1L, 250L, 176L),
      (5L, 1L, 250L, 79L)))
    // delta is exactly share − expectation
    val deltas = Quality.benfordDigits(rows).collect()
      .map(r => r.getLong(4) - (r.getLong(2) - r.getLong(3)))
    assert(deltas.forall(_ == 0L))
  }

  test("t-closeness EMD is exact, boundary EMD = t is NOT a breach") {
    // buckets: bal −999.00 → 0, 1201.00 → 1 (cents+100000 div 110000)
    // global: bucket0 = 8(A) + 4(B) = 12, bucket1 = 4 → G = 16, m = 2
    // class A (8 rows, all bucket0): cum = 8·16 − 12·8 = 32, then 0
    //   → emd 32/128 = 1/4 = t exactly → NOT a breach (strict >)
    // class B (4/4): cum = 4·16 − 12·8 = −32, then 0 → emd 32/128 too
    val rows = (0 until 8).map(_ => (1L, "A", -999.0)) ++
      (0 until 4).map(_ => (2L, "B", -999.0)) ++
      (0 until 4).map(_ => (2L, "B", 1201.0))
    val df = rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Quality.tClosenessAudit(df)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("A") === ((8L, 32L, 128L, false)),
      "EMD exactly t must not breach")
    assert(got("B") === ((8L, 32L, 128L, false)))
    // tighten t to 1/8: both classes now sit strictly above and breach
    val tight = Quality.tClosenessAudit(df, tNum = 1L, tDen = 8L)
      .collect().map(r => r.getString(1) -> r.getBoolean(5)).toMap
    assert(tight === Map("A" -> true, "B" -> true))
  }

  test("cusum window identity equals the sequential max(0, S+y) fold") {
    val h = 3600000000L
    // one event per (bar, type) occurrence: counts per bar = multiplicity
    val counts = Seq(3L, 3L, 9L, 1L, 1L, 7L, 8L, 1L, 3L) // mean 4 (36/9)
    val rows = counts.zipWithIndex.flatMap { case (c, bar) =>
      (0L until c).map(j => (bar * 1000L + j, bar * h, "a"))
    }
    val df = rows.toDF("event_id", "usl", "event_type")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Quality.cusumRate(df, barUs = h, threshold = 5L)
      .collect().map(r => (r.getLong(1) / h, r.getLong(4), r.getBoolean(5)))
    val target = counts.sum / counts.length
    val want = counts.scanLeft(0L)((s, n) => math.max(0L, s + n - target)).tail
    assert(got.map(_._2).toSeq === want, "window form must equal the fold")
    assert(got.forall { case (_, c, d) => d === (c >= 5L) })
    assert(got.map(_._1).toSeq === (0L until 9L).toSeq)
  }

  test("fdAudit: held and violated dependencies, null semantics pinned") {
    // orders: o_orderkey -> o_custkey HOLDS (key); o_custkey ->
    // o_orderpriority violated at custkey 1 (P1, P2) and by custkey 2's
    // null-vs-P1 split (null dependent counts as a value); null
    // determinant row is excluded entirely
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val ordersDf = Seq(
      (1L, jl(1L), "O", 10.0, "2024-01-01", "P1"),
      (2L, jl(1L), "O", 20.0, "2024-01-01", "P2"),
      (3L, jl(2L), "F", 30.0, "2024-01-02", "P1"),
      (4L, jl(2L), "F", 40.0, "2024-01-02", null),
      (5L, null.asInstanceOf[java.lang.Long], "F", 50.0, "2024-01-03", "P3")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val lineitemDf = Seq(
      (1L, 100L, 7L, "A"), (1L, 101L, 7L, "A"), // l_orderkey 1 -> one flag
      (2L, 100L, 8L, "N"), (2L, 102L, 9L, "R")  // orderkey 2 -> two flags
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
    val got = Quality.fdAudit(ordersDf, lineitemDf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // o_orderkey -> o_custkey: 4 non-null keys (order 5 has null det?
    // no — det is o_orderkey, never null here: 5 keys), all singletons
    assert(got(("o_orderkey", "o_custkey")) === ((5L, 0L, 1L, true)))
    // o_custkey -> o_orderpriority: keys {1, 2}; both map to 2 values
    // (custkey 2 via the null priority), null custkey excluded
    assert(got(("o_custkey", "o_orderpriority")) === ((2L, 2L, 2L, false)))
    // o_orderdate -> o_orderstatus: 3 dates, each one status
    assert(got(("o_orderdate", "o_orderstatus")) === ((3L, 0L, 1L, true)))
    // l_orderkey -> l_returnflag: key 1 holds, key 2 violates
    assert(got(("l_orderkey", "l_returnflag")) === ((2L, 1L, 2L, false)))
    // l_partkey -> l_suppkey: 100 -> {7,8} violates; 101, 102 hold
    assert(got(("l_partkey", "l_suppkey")) === ((3L, 1L, 2L, false)))
  }

  test("reconcile: exact match, drift, and header-only orders separated") {
    // order 1: two lines summing exactly to the header (reconciled).
    // order 2: lines drift +25 cents. order 3: header only (no lines).
    val ordersDf = Seq(
      (1L, "O", 30.0), (2L, "O", 10.0), (3L, "F", 5.0)
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitemDf = Seq(
      (1L, 10.0, 0.0, 0.0), (1L, 20.0, 0.0, 0.0), // 1000 + 2000 = 3000 ✔
      (2L, 10.25, 0.0, 0.0)                        // 1025 vs 1000 ✘ (+25)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = Quality.reconcile(ordersDf, lineitemDf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getLong(6)))).toMap
    assert(got("O") === ((2L, 0L, 1L, 1L, Some(25L), 25L)))
    assert(got("F") === ((1L, 1L, 0L, 0L, None, 0L)),
      "header-only order is n_no_lines, with null max diff")
  }

  test("sequenceGaps: run count, widest gap, and span-minus-count missing total") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (5L, "a"), (9L, "a"), // gaps {3,4} and {6,7,8}
      (1L, "b"), (2L, "b"))                       // dense: no gaps
      .toDF("event_id", "event_type")
    val got = Quality.sequenceGaps(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((4L, 1L, 9L)))
    assert(a.getLong(4) === 5L, "missing = span - count = 9 - 4")
    assert(a.getLong(5) === 2L, "two gap runs")
    assert(a.getLong(6) === 3L, "widest run is {6,7,8}")
    val b = got("b")
    assert(b.getLong(4) === 0L)
    assert(b.getLong(5) === 0L)
    assert(b.isNullAt(6), "no gaps -> null max_gap")
  }

  test("distributionDrift: identical halves score 0, disjoint halves score 1000") {
    def ev(id: Long, us: Long, typ: String, v: Double) = (id, us, typ, v)
    val df = Seq(
      // type a: both halves occupy the same two bins -> TVD 0
      ev(1L, 0L, "a", 10.0), ev(2L, 10L, "a", 60.0),
      ev(3L, 60L, "a", 10.0), ev(4L, 100L, "a", 60.0),
      // type b: halves in disjoint bins -> TVD 1 (1000 permille)
      ev(5L, 0L, "b", 10.0), ev(6L, 100L, "b", 200.0))
      .toDF("event_id", "usl", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Quality.distributionDrift(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(4) === 0L)
    assert(got("a").getLong(3) === 2L, "two occupied bins")
    assert(got("b").getLong(4) === 1000L)
  }

  test("ksDrift: 0 for identical halves, 1000 for disjoint, 500 for a half-mass shift") {
    def ev(id: Long, us: Long, typ: String, v: Double) = (id, us, typ, v)
    // global mid = (0 + 100) div 2 = 50: us <= 50 is half 1
    val df = Seq(
      // a: both halves are {10, 60} -> ECDFs identical -> KS 0
      ev(1L, 0L, "a", 10.0), ev(2L, 10L, "a", 60.0),
      ev(3L, 60L, "a", 10.0), ev(4L, 100L, "a", 60.0),
      // b: half 1 all below half 2 -> sup gap 1 -> 1000 permille
      ev(5L, 0L, "b", 10.0), ev(6L, 100L, "b", 200.0),
      // c: {1,2} vs {2,3} -> max |F1-F2| at v=1: |1/2 - 0/2| = 0.5
      ev(7L, 0L, "c", 1.0), ev(8L, 10L, "c", 2.0),
      ev(9L, 60L, "c", 2.0), ev(10L, 100L, "c", 3.0))
      .toDF("event_id", "usl", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Quality.ksDrift(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(4) === 0L)
    assert((got("a").getLong(1), got("a").getLong(2), got("a").getLong(3)) ===
      ((2L, 2L, 2L)), "n1/n2 halves of 2, two distinct values")
    assert(got("b").getLong(4) === 1000L)
    assert(got("c").getLong(4) === 500L)
    assert(got("c").getLong(3) === 3L, "three distinct values in the pool")
  }

  test("giniImpurity: uniform column hits (k-1)/k, constant column is pure") {
    val df = Seq(
      (1L, "a", 1L, 5.0), (2L, "a", 2L, 5.0),
      (3L, "a", 3L, 5.0), (4L, "b", 4L, 5.0))
      .toDF("event_id", "event_type", "user_id", "value")
    val got = Quality.giniImpurity(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // counts (3,1): gini = 1000*(16-10)/16 = 375; enc = 16 div 10 = 1
    assert(got("event_type") === ((4L, 2L, 375L, 1L)))
    // uniform over 4: gini = 750 = (k-1)/k, enc = exactly k
    assert(got("user_id") === ((4L, 4L, 750L, 4L)))
    // constant: impurity 0, one effective category
    assert(got("value_cents") === ((4L, 1L, 0L, 1L)))
  }

  test("winsorizedStats: discrete p05/p95 clamp, counts, floor mean") {
    // n=20 values 1.00..20.00 in one group: k_lo = 19*5 div 100 + 1 = 1
    // (lo = min, nothing clamps low), k_hi = 19*95 div 100 + 1 = 19
    // (hi = 19.00, exactly one value above clamps down to 1900 cents).
    val df = (1 to 20).map(i => ("GRP", i.toDouble))
      .toDF("o_orderpriority", "o_totalprice")
    val out = Quality.winsorizedStats(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 20L, "n_orders")
    assert(r.getLong(2) === 100L, "lo_cents = discrete p05 = min here")
    assert(r.getLong(3) === 1900L, "hi_cents = 19th order statistic")
    assert(r.getLong(4) === (1 to 19).map(_ * 100L).sum + 1900L, "wins sum")
    assert(r.getLong(5) === 0L, "n_clamped_low")
    assert(r.getLong(6) === 1L, "n_clamped_high")
    assert(r.getLong(7) === r.getLong(4) / 20L, "floor mean")
  }

  test("volumeAnomalies: same-weekday median baseline, only full-history days emit") {
    import org.apache.spark.sql.functions.timestamp_micros
    val d = 86400000000L
    // 2 events on days 0,7,14,21,28 and 6 events on day 35:
    // day 28 → refs (2,2,2,2), dev 1000‰, normal; day 35 → refs
    // (2,2,2,2), dev 3000‰, anomaly. Earlier days lack full history.
    val rows = Seq(0, 7, 14, 21, 28).flatMap(k =>
      Seq(k * d + 1, k * d + 2)) ++ (1 to 6).map(i => 35 * d + i)
    val df = rows.toDF("usl")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = Quality.volumeAnomalies(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      28L -> ((2L, 4L, 1000L, 0L)),
      35L -> ((6L, 4L, 3000L, 1L))))
  }
}
