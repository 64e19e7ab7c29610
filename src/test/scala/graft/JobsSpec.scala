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

  test("corpus-prep job writes split/lang shards matching the certified split rule") {
    import graft.jobs.CorpusPrepJob
    import graft.operators.{TextOps, TrainingPipeline}
    val shardsDir = tmpDir("jobs-shards")
    val manifest = CorpusPrepJob.run(spark, s"$sf0001/documents.parquet",
      shardsDir, table = Some("jobs_shards"))
    val m = manifest.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m.nonEmpty)

    // disk layout: split=... / lang=... — ALL THREE splits must
    // materialize (the default job curates the whole corpus; a sample
    // rate colliding with the split nibbles would silently empty val/test)
    val lvl1 = new java.io.File(shardsDir).listFiles().filter(_.getName.startsWith("split="))
    assert(lvl1.map(_.getName).toSet === Set("split=train", "split=val", "split=test"))
    assert(lvl1.head.listFiles().exists(_.getName.startsWith("lang=")))

    // the manifest equals a recompute from the survivor stage
    val want = TrainingPipeline.curatedSurvivors(Tables.documents(spark, sf0001),
        sampleSixteenths = 16)
      .withColumn("split", TextOps.splitColumn())
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m === want)

    // every row on disk carries the split its doc_id hashes to — the d11
    // contract rule, verified on the MATERIALIZED shards
    val disk = spark.table("jobs_shards")
    assert(disk.filter(col("split") =!= TextOps.splitColumn()).count() === 0)

    // rerun is idempotent (full overwrite semantics)
    val m2 = CorpusPrepJob.run(spark, s"$sf0001/documents.parquet", shardsDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m2 === m)
  }

  test("maintenance job compacts, refreshes stats, and gates publish on expectations") {
    import graft.jobs.MaintenanceJob
    val dir = tmpDir("maint")
    Tables.orders(spark, sf0001).repartition(12)
      .write.mode("overwrite").parquet(dir)
    spark.sql(s"CREATE TABLE maint_t USING parquet LOCATION '$dir'")
    try {
      val (before, after, profile) = MaintenanceJob.run(spark, dir,
        profileCols = Seq("o_totalprice"),
        rules = Seq("total_positive" -> (col("o_totalprice") > 0)),
        table = Some("maint_t"))
      assert(after < before, s"expected compaction, got $before -> $after")
      assert(profile.length === 1 && profile.head.getLong(2) === 0) // no nulls
      // catalog stats refreshed: CBO sees a row count (rowCount is only
      // surfaced in plan estimates when the cost-based optimizer is on)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val stats = spark.table("maint_t").queryExecution.optimizedPlan.stats
        assert(stats.rowCount.exists(_.longValue > 0), s"rowCount missing: $stats")
      } finally spark.conf.unset("spark.sql.cbo.enabled")
      // the table reads cleanly after the rewrite (no stale file listings)
      assert(spark.table("maint_t").count() === Tables.orders(spark, sf0001).count())
      // gate failure: an impossible rule aborts with the rule named
      val e = intercept[IllegalArgumentException] {
        MaintenanceJob.run(spark, dir, Seq("o_totalprice"),
          Seq("impossible" -> (col("o_totalprice") < 0)))
      }
      assert(e.getMessage.contains("impossible"))
    } finally spark.sql("DROP TABLE IF EXISTS maint_t")
  }

  test("schema-evolved parquet generations merge into the superset schema") {
    // long-lived lakes accrete columns; readers must see old + new files
    // as ONE relation with nulls for pre-evolution rows
    val dir = tmpDir("evolve")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")), "old files read as null")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) === 9.5)
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
