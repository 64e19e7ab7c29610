package graft

import org.apache.spark.sql.functions._
import graft.plans.CollectSizeToCount

/** The size(collect_*) → count rewrite: plan-level (buffer aggregate gone)
  * and value-level (null skipping, distinct, empty behavior preserved).
  */
class OptimizerRuleSpec extends SparkTestBase {
  import spark.implicits._

  // register once on the shared session (the production path injects the
  // same rule via GraftExtensions; experimental is the live-session hook)
  if (!spark.experimental.extraOptimizations.contains(CollectSizeToCount)) {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollectSizeToCount
  }

  private def agged = Seq(
    (1, Some("a")), (1, Some("b")), (1, Some("a")), (1, None), (2, Some("c")))
    .toDF("k", "v")
    .groupBy("k")
    .agg(size(collect_list($"v")).as("n"), size(collect_set($"v")).as("nd"))

  test("rewrites to count/count-distinct in the optimized plan") {
    val optimized = agged.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("collect_list"), optimized)
    assert(!optimized.contains("collect_set"), optimized)
    assert(optimized.contains("count"), optimized)
  }

  test("values match collect semantics: nulls skipped, set deduped, types int") {
    val rows = agged.orderBy("k").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq === Seq((1, 3, 2), (2, 1, 1)))
  }

  test("a genuine collect_list value expression is left alone") {
    val df = Seq((1, "a"), (1, "b")).toDF("k", "v")
      .groupBy("k").agg(array_sort(collect_list($"v")).as("vs"))
    assert(df.queryExecution.optimizedPlan.toString.contains("collect_list"))
    assert(df.collect().head.getSeq[String](1) === Seq("a", "b"))
  }
}
