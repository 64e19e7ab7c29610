package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Dedup, Evaluation, JoinOps, MergeOps,
  Quality, Sessions, Similarity, TextOps, TimeSeries}

/** Hand-computed referees for the evaluation tier (exact AUC, chi-squared
  * association) plus the golden-record survivorship merge and the
  * inverted-index build added in the same session.
  */
class EvaluationSpec extends SparkTestBase {
  import spark.implicits._

  test("aucStats: hand-computed U with a tie, perfect and inverse separation") {
    val docs = Seq(
      // source s: pos scores {3, 5}, neg scores {1, 5}
      //   pairs: 3>1 win, 3<5 loss, 5>1 win, 5=5 tie -> U = 2.5 of 4
      (0L, "en", "s", 3L), (1L, "en", "s", 5L),
      (2L, "de", "s", 1L), (3L, "fr", "s", 5L),
      // source p: perfect separation -> AUC 1
      (4L, "en", "p", 10L), (5L, "en", "p", 11L),
      (6L, "de", "p", 1L), (7L, "zh", "p", 2L),
      // source i: perfectly inverted -> AUC 0
      (8L, "en", "i", 1L), (9L, "de", "i", 9L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = Evaluation.aucStats(docs)
      .select("source", "n_pos", "n_neg", "u2", "auc_permille")
      .as[(String, Long, Long, Long, Long)].collect().toMap2
    assert(out("s") == ((2L, 2L, 5L, 625L)))  // 2U = 5, AUC = 5/8
    assert(out("p") == ((2L, 2L, 8L, 1000L)))
    assert(out("i") == ((1L, 1L, 0L, 0L)))
  }

  test("chi2Association: perfect association scores chi2 = N, uniform scores 0") {
    // token "hot" in exactly the 3 en docs; "cold" in exactly the 2 others;
    // "meh" in one of each class (near-independent)
    val docs = Seq(
      (0L, "en", "s", "hot meh"), (1L, "en", "s", "hot"), (2L, "en", "s", "hot"),
      (3L, "de", "s", "cold meh"), (4L, "fr", "s", "cold")
    ).toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")))
    val out = Evaluation.chi2Association(docs, minDf = 1L, k = 10)
      .select("tok", "chi2_micro", "direction")
      .as[(String, Long, Long)].collect().toMap2
    // perfect 2x2: chi2 = N = 5 -> 5_000_000 micro; signs by class
    assert(out("hot") == ((5000000L, 1L)))
    assert(out("cold") == ((5000000L, -1L)))
    // meh: a=1 b=1 c=2 d=1, det = 1-2 = -1, chi2 = 5*1/(2*3*3*2) = 5/36
    assert(out("meh") == ((5L * 1000000L / 36L, -1L)))
  }

  test("goldenRecord: attributes survive from different events; absent legs null") {
    val events = Seq(
      // user 1: purchase then click then view -> each attribute from its
      // own event, status from the latest of all three
      (10L, 1L, 1000L, "purchase", 12.34, """{"k": 7}"""),
      (11L, 1L, 2000L, "click", 99.0, """{"k": 42}"""),
      (12L, 1L, 3000L, "view", 1.0, """{"k": 9}"""),
      // user 2: views only -> purchase/click legs null, status still set
      (13L, 2L, 500L, "view", 2.0, """{"k": 1}"""),
      // user 3: two purchases, same us -> event_id breaks the tie
      (14L, 3L, 4000L, "purchase", 1.00, "{}"),
      (15L, 3L, 4000L, "purchase", 2.00, "{}")
    ).toDF("event_id", "user_id", "usl", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val out = MergeOps.goldenRecord(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(1) == 3L && u1.getString(2) == "view")
    assert(u1.getLong(3) == 3000L)                    // status provenance
    assert(u1.getLong(4) == 1234L && u1.getLong(5) == 1000L)
    assert(u1.getLong(6) == 42L && u1.getLong(7) == 2000L)
    val u2 = out(2L)
    assert(u2.getString(2) == "view" && u2.isNullAt(4) && u2.isNullAt(6))
    assert(out(3L).getLong(4) == 200L)                // higher event_id wins
  }

  test("invertedIndex: df/cf over all postings, top list capped and ordered") {
    val docs = Seq(
      (0L, "a a b"), (1L, "a c"), (2L, "b b b")
    ).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, minDf = 1L, topPostings = 2)
      .as[(String, Long, Long, String)].collect().toMap2
    assert(out("a") == ((2L, 3L, "0:2,1:1")))   // tf desc breaks before doc_id
    assert(out("b") == ((2L, 4L, "2:3,0:1")))   // cap at 2 still counts cf = 4
    assert(out("c") == ((1L, 1L, "1:1")))
  }

  test("rrfFusion: both-leg docs sum both terms, single-leg docs keep one") {
    val embeddings = Seq(
      (0L, Array(1f, 0f)),    // the query vector
      (1L, Array(1f, 0f)),    // cosine 1.0 -> dense rank 1
      (2L, Array(0.9f, 0.1f)),// dense rank 2
      (3L, Array(0f, 1f))     // cosine 0 -> outside kEach = 2
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (2L, "spark merge"),    // the only term-hitting doc -> sparse rank 1
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val out = Similarity
      .rrfFusion(embeddings, docs, 0L, Seq("spark", "merge"), kEach = 2, k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val d2 = out(2L)
    assert(d2.getLong(1) == 2L && d2.getLong(2) == 1L)
    assert(d2.getLong(3) == 1000000L / 62 + 1000000L / 61)
    val d1 = out(1L)
    assert(d1.getLong(1) == 1L && d1.isNullAt(2))
    assert(d1.getLong(3) == 1000000L / 61)
    // fused order: the both-leg doc outranks the dense-only leader
    assert(out(2L).getLong(3) > out(1L).getLong(3))
  }

  test("calibrationBins and prCurve: hand-computed counts and permilles") {
    val docs = Seq(
      (0L, "en", 50L), (1L, "en", 150L), (2L, "de", 150L),
      (3L, "en", 250L), (4L, "fr", 260L), (5L, "zh", 40L)
    ).toDF("doc_id", "lang", "n_chars")
    val bins = Evaluation.calibrationBins(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(bins(0L) == ((2L, 1L, 500L)))   // chars 50, 40
    assert(bins(1L) == ((2L, 1L, 500L)))   // chars 150, 150
    assert(bins(2L) == ((2L, 1L, 500L)))   // chars 250, 260
    val pr = Evaluation.prCurve(docs, Seq(100L, 1000L))
      .collect().map(r => r.getLong(0) -> r).toMap
    val t100 = pr(100L)   // >=100: docs 1..4 -> tp 2 (en), fp 2; below: tp-miss 1
    assert(t100.getLong(1) == 2L && t100.getLong(2) == 2L &&
      t100.getLong(3) == 1L && t100.getLong(4) == 1L)
    assert(t100.getLong(5) == 500L && t100.getLong(6) == 666L)
    val t1k = pr(1000L)   // nothing passes: precision NULL, recall 0
    assert(t1k.getLong(1) == 0L && t1k.isNullAt(5) && t1k.getLong(6) == 0L)
  }

  test("joinCardinalityEstimate: hybrid recovers skew the uniform formula misses") {
    // counts 3,1,1,1 -> exact 12; uniform 36 div 4 = 9; with topH = 1 the
    // heavy key is exact and the 3-row/3-key tail is truly uniform -> 12
    val events = (Seq.fill(3)(1L) ++ Seq(2L, 3L, 4L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val r = Evaluation.joinCardinalityEstimate(events, topH = 1).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L && r.getLong(2) == 12L)
    assert(r.getLong(3) == 9L && r.getLong(4) == 12L)
    assert(r.getLong(5) == 750L && r.getLong(6) == 1000L)
  }

  test("seasonalBacktest: calendar join skips gap hours, warm-up excluded") {
    val h = 3600000000L
    val events = Seq(
      (0L, 0L), (1L, 1L),            // hour 0: 2 events
      (2L, 24 * h), (3L, 24 * h + 5L), (4L, 24 * h + 9L), // hour 24: 3
      (5L, 48 * h),                  // hour 48: 1 (base hour 24 -> err 2)
      (6L, 49 * h)                   // hour 49: no hour-25 base -> missing
    ).map { case (id, us) => (id, "A", us) }
      .toDF("event_id", "event_type", "usl")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val r = TimeSeries.seasonalBacktest(events).head()
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 3L)   // hours 24, 48, 49 evaluated
    assert(r.getLong(2) == 1L)   // hour 49 has no base
    assert(r.getLong(3) == 3L)   // |3-2| + |1-3|
    assert(r.getLong(4) == -1L)  // (3-2) + (1-3)
    assert(r.getLong(5) == 2L)
  }

  test("lexicalDiversity: TTR and hapax share on a literal corpus") {
    val docs = Seq((0L, "s", "a a b"), (1L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.lexicalDiversity(docs).head()
    assert(r.getString(0) == "s" && r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 2L && r.getLong(4) == 750L && r.getLong(5) == 666L)
  }

  test("liftDeciles: top-decile lift, capture saturates to 1000, no-positive source nulls") {
    // source s: 20 docs scored 20..1, the 5 positives hold the 5 best scores
    val s = (1 to 20).map(i =>
      (i.toLong, "s", 21 - i, if (i <= 5) "en" else "fr"))
    // source t: 3 docs, zero positives -> ntile puts one per leading decile
    val t = (21 to 23).map(i => (i.toLong, "t", 30 - i, "fr"))
    val docs = (s ++ t).toDF("doc_id", "source", "n_chars", "lang")
    val got = Evaluation.liftDeciles(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val d1 = got(("s", 1L)) // docs 1,2: both positive
    assert((d1.getLong(2), d1.getLong(3)) === ((2L, 2L)))
    assert(d1.getLong(4) === 400L, "capture 2/5")
    assert(d1.getLong(5) === 4000L, "4x the 25% base rate")
    val d3 = got(("s", 3L)) // cum 6 rows, 5 positives: capture complete
    assert(d3.getLong(4) === 1000L)
    assert(d3.getLong(5) === (5L * 20L * 1000L) / (6L * 5L))
    val d10 = got(("s", 10L))
    assert((d10.getLong(4), d10.getLong(5)) === ((1000L, 1000L)))
    assert(got.keys.count(_._1 == "t") === 3, "3 rows -> deciles 1..3 only")
    assert(got(("t", 1L)).isNullAt(4) && got(("t", 1L)).isNullAt(5),
      "zero positives -> NULL permilles, not fake zeros")
  }

  test("crosstabPriorityStatus: cell counts and the crosstab column contract") {
    val orders = Seq(
      (1L, "1-URGENT", "F"), (2L, "1-URGENT", "F"), (3L, "1-URGENT", "O"),
      (4L, "2-HIGH", "P"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val got = Aggregates.crosstabPriorityStatus(orders)
    assert(got.columns.toSet === Set("o_orderpriority_o_orderstatus", "F", "O", "P"))
    val rows = got.collect().map(r => r.getString(0) ->
      ((r.getLong(got.columns.indexOf("F")), r.getLong(got.columns.indexOf("O")),
        r.getLong(got.columns.indexOf("P"))))).toMap
    assert(rows("1-URGENT") === ((2L, 1L, 0L)))
    assert(rows("2-HIGH") === ((0L, 0L, 1L)))
  }

  test("incrementalSessionize == one-shot sessionize at every cut position") {
    val hourUs = 3600000000L
    // deterministic scatter: 120 events, 6 users, inter-event gaps that
    // straddle the 24 h boundary both ways
    val events = (0 until 120).map { i =>
      val us = ((i * 2654435761L) % 97) * hourUs + (i % 7) * 1000L
      (i.toLong, (i % 6).toLong, us, (i % 50) / 10.0)
    }.toDF("event_id", "user_id", "usl", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val oneShot = Sessions.sessionize(events).collect().toSeq
    val allUs = (0 until 120).map(i => ((i * 2654435761L) % 97) * hourUs)
    for (cut <- Seq(0L, allUs.min + 1, allUs.max / 3, allUs.max / 2,
        allUs.max, allUs.max + hourUs)) {
      val inc = Sessions.incrementalSessionize(events, cutUs = Some(cut))
        .collect().toSeq
      assert(inc == oneShot, s"mismatch at cut $cut")
    }
  }

  test("crossSourceDups: within-source C(c,2), cross-source c_a*c_b") {
    val docs = Seq(
      (0L, "A", "x"), (1L, "A", "x"), (2L, "A", "y"),
      (3L, "B", "x"), (4L, "B", "z"), (5L, "C", "q")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.crossSourceDups(docs)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("A", "A", 1L), ("A", "B", 2L)))
  }

  test("tableChecksums: partition/order-invariant, sensitive to one cent") {
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val base = Quality.tableChecksums(orders, lineitem, customer).collect()
    val shuffled = Quality.tableChecksums(
      orders.repartition(13), lineitem.repartition(7), customer.repartition(3))
      .collect()
    assert(base.toSeq == shuffled.toSeq) // XOR signature ignores layout
    val mutated = Quality.tableChecksums(
      orders.withColumn("o_totalprice",
        when(col("o_orderkey") === orders.select(min("o_orderkey")).head().getLong(0),
          col("o_totalprice") + 0.01).otherwise(col("o_totalprice"))),
      lineitem, customer).collect()
    val b = base.map(r => r.getString(0) -> r.getLong(2)).toMap
    val m = mutated.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(b("orders") != m("orders") && b("lineitem") == m("lineitem"))
  }

  test("q18BigSpenders: HAVING bound, join-back fields, cents ordering") {
    val lineitem = Seq(
      (1L, 1, 150.0), (1L, 2, 100.0),  // order 1: qty 250 -> big
      (2L, 1, 250.0),                  // order 2: qty 250 -> big
      (3L, 1, 200.0)                   // order 3: qty 200 -> NOT > 200
    ).toDF("l_orderkey", "l_linenumber", "l_quantity")
    val orders = Seq(
      (1L, 10L, "O", 500.00, 86400000000L, "1-URGENT"),
      (2L, 11L, "F", 700.00, 0L, "2-HIGH"),
      (3L, 10L, "O", 900.00, 0L, "3-MEDIUM")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "usl", "o_orderpriority")
      .withColumn("o_orderdate", timestamp_micros(col("usl"))).drop("usl")
    val customer = Seq((10L, "alice"), (11L, "bob"))
      .toDF("c_custkey", "c_name")
    val out = JoinOps.q18BigSpenders(customer, orders, lineitem).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // 700 > 500; 3 excluded
    val top = out.head
    assert(top.getString(1) == "bob" && top.getLong(3) == 0L &&
      top.getLong(4) == 70000L && top.getLong(5) == 250L)
  }

  test("retrievalEval: label-relevance hit/MRR/recall on a crafted cluster") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0L),
      (1L, Array(0.9f, 0.1f), 0L),
      (2L, Array(0.8f, 0.2f), 0L),
      (3L, Array(0.0f, 1.0f), 1L),
      (4L, Array(0.1f, 0.9f), 1L),
      (5L, Array(1.0f, 0.01f), 1L) // label 1 but sits inside the 0-cluster
    ).toDF("vec_id", "embedding", "label")
    val out = Evaluation.retrievalEval(emb, Seq(0L, 5L), 2)
      .select("query_id", "n_rel_at_k", "hit_at_k", "mrr_permille",
        "recall_permille")
      .as[(Long, Long, Boolean, Long, Long)].collect().sortBy(_._1)
    // query 0 (label 0): top-2 is v5 (cross-label) then v1 (relevant,
    // rank 2) -> MRR 1000 div 2; recall 1 of the 2 same-label others
    assert(out(0) == ((0L, 1L, true, 500L, 500L)))
    // query 5 (label 1): top-2 = v0, v1 - both cross-label -> all zeros
    assert(out(1) == ((5L, 0L, false, 0L, 0L)))
  }

  private implicit class Map2[K, V1, V2, V3, V4](rows: Array[(K, V1, V2, V3, V4)]) {
    def toMap2: Map[K, (V1, V2, V3, V4)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
  private implicit class Map2b[K, V1, V2](rows: Array[(K, V1, V2)]) {
    def toMap2: Map[K, (V1, V2)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
  private implicit class Map2c[K, V1, V2, V3](rows: Array[(K, V1, V2, V3)]) {
    def toMap2: Map[K, (V1, V2, V3)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
