package graft

import org.apache.spark.sql.functions._
import graft.jobs.{CollectorJob, TransformJob}

/** End-to-end medallion flow: collector job → raw layer → transform job →
  * refined layer → marts, all through the job entry points (the
  * reference's E1→E3 chain without the AWS control plane).
  */
class JobsSpec extends SparkTestBase {

  test("collector -> transform -> marts end to end") {
    val rawDir = tmpDir("jobs-raw")
    val refinedDir = tmpDir("jobs-refined")

    val n = CollectorJob.run(spark, Seq("AAA.SA", "FAIL3.SA", "BBB.SA"),
      FakeFetch.apply, rawDir, table = Some("jobs_raw"))
    assert(n === 10) // failed ticker isolated
    assert(spark.table("jobs_raw").count() === 10)
    // raw layout is dataproc-partitioned
    assert(new java.io.File(rawDir).listFiles().exists(_.getName.startsWith("dataproc=")))

    // transform consumes an events-shaped table; stage sf0.001 events as raw
    val evRaw = tmpDir("jobs-events")
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(evRaw)

    val refined = TransformJob.run(spark, evRaw, refinedDir, Some("jobs_refined"))
    assert(refined === 1000)
    assert(spark.table("jobs_refined").count() === 1000)
    // refined layout: dataproc=... / user_id=...
    val lvl1 = new java.io.File(refinedDir).listFiles()
      .filter(_.getName.startsWith("dataproc="))
    assert(lvl1.nonEmpty)
    assert(lvl1.head.listFiles().exists(_.getName.startsWith("user_id=")))

    // E4: the reference's documented Athena SQL runs verbatim over the
    // registered refined table through spark.sql
    val athena = TransformJob.athenaStyleSummary(spark, "jobs_refined")
    assert(athena.count() > 0)
    assert(athena.columns.toSeq ===
      Seq("user_id", "year", "month", "total_registros", "volume_total", "media_preco"))
    val a0 = athena.first()
    assert(a0.getAs[Long]("total_registros") > 0)

    // marts over the refined layer match the direct in-memory pipeline
    val martRows = TransformJob.summaryMart(spark, refinedDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val directRows = operators.B3Pipeline.flagship(Tables.events(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(martRows === directRows)
  }

  test("observe() + listener account rows in one pass (no recount actions)") {
    import graft.jobs.Observability
    val rec = Observability.register(spark)
    try {
      val events = Tables.events(spark, sf0001)
      val expected = events.count()
      rec.clear()
      val observed = Observability.observeRows(events, "gate", "value")
      observed.write.format("noop").mode("overwrite").save() // ONE action
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      def gate() = rec.records.flatMap(_.observed.get("gate")).headOption
      while (gate().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val row = gate().getOrElse(fail(s"no observation delivered: ${rec.records}"))
      assert(row.getAs[Long]("rows") === expected)
      assert(row.getAs[Long]("value_not_null") <= expected)
      assert(rec.records.forall(_.error.isEmpty))
    } finally spark.listenerManager.unregister(rec)
  }
}
