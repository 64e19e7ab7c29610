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
}
