package graft

import org.apache.spark.sql.{Row, SparkSession}

/** Dev-only probe main: drives the library surface end-to-end the way a
  * user of the engine would (ingest → partitioned sink → catalog →
  * streaming → multimodal), printing observed state.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("probe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("== flagship entry ==")
    SparkEntry.entry(spark).show(3, truncate = false)

    println("== ingest -> 2-level partitioned sink -> external catalog ==")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def fetch(t: String): Seq[Row] = {
      if (t == "BAD.SA") throw new RuntimeException("boom")
      (0 until 5).map(d => Row(new java.sql.Timestamp(base + d * 86400000L),
        10.0, 12.0, 9.0, 11.0 + d, 1000L + d, 0.0, 0.0, t.stripSuffix(".SA")))
    }
    val ingested = sources.Ingest.ingest(spark, Seq("AAA.SA", "BAD.SA", "BBB.SA"), fetch)
    println(s"ingested rows (1 ticker failed, isolated): ${ingested.count()}")
    val sinkDir = java.nio.file.Files.createTempDirectory("probe-sink").toString
    sources.Sinks.writePartitioned2(ingested, sinkDir, "dataproc", "ticker")
    println("sink layout: " + new java.io.File(sinkDir).listFiles()
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty).map(_.getName)).mkString(", "))
    sources.Sinks.createOrReplaceExternal(spark, "stocks_probe", sinkDir, Seq("dataproc", "ticker"))
    sources.Sinks.recoverPartitions(spark, "stocks_probe")
    println(s"catalog table rows: ${spark.table("stocks_probe").count()}")

    println("== streaming slice (AvailableNow over parquet drops) ==")
    val evBatch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val rawDir = java.nio.file.Files.createTempDirectory("probe-raw").toString
    evBatch.coalesce(2).write.mode("overwrite").parquet(rawDir)
    val streamed = streaming.EventStream.windowedCounts(
      streaming.EventStream.readRaw(spark, rawDir, spark.read.parquet(rawDir).schema))
    streaming.EventStream.runAvailableNow(spark, streamed, "probe_win",
      java.nio.file.Files.createTempDirectory("probe-ckpt").toString, "complete")
    spark.table("probe_win").show(5, truncate = false)

    println("== multimodal features ==")
    operators.Multimodal.extractFeatures(
      operators.Multimodal.fromDocuments(Tables.documents(spark, "/root/testdata/sf0.001")))
      .show(3, truncate = false)

    spark.stop()
  }
}
