package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.sources.{FetcherRegistry, Ingest, RowFetcher}

/** Class-based fetcher (the cluster-safe path): instantiated on the
  * reader from its class name, no closure shipping.
  */
class FakeRowFetcher extends RowFetcher {
  override def fetch(item: String): Seq[Row] = FakeRowFetcher.rows(item)
}

object FakeRowFetcher {
  def rows(item: String): Seq[Row] = {
    if (item == "BOOM") throw new RuntimeException("simulated fetch failure")
    (0 until 3).map { d =>
      Row(Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00"),
        10.0 + d, 11.0 + d, 9.0 + d, 10.5 + d, 1000L + d, 0.0, 0.0, item)
    }
  }
}

/** DataSourceV2 `graft-fetch` source: schema, parallel partitioning,
  * error isolation, column pruning, both fetcher resolution paths.
  */
class GraftFetchSourceSpec extends SparkTestBase {

  private def read(items: String, extra: Map[String, String] = Map.empty) = {
    var r = spark.read.format("graft-fetch").option("items", items)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.option("fetcherClass", classOf[FakeRowFetcher].getName).load()
  }

  test("reads per-item rows with the explicit raw schema") {
    val df = read("AAA,BBB")
    assert(df.schema === Ingest.rawSchema)
    val rows = df.collect()
    assert(rows.length === 6)
    assert(rows.map(_.getString(8)).toSet === Set("AAA", "BBB"))
  }

  test("a failing item is skipped, not fatal (S2 error isolation)") {
    // counters are keyed by fetcher identity, so a concurrently running
    // scan with a different fetcher cannot interleave with this delta
    val key = classOf[FakeRowFetcher].getName
    val before = graft.sources.GraftFetchSkips.sum(key)
    val rows = read("AAA,BOOM,CCC").collect()
    assert(rows.length === 6, "BOOM's failure must not kill the scan")
    assert(rows.map(_.getString(8)).toSet === Set("AAA", "CCC"))
    // the skip must be OBSERVABLE, not silent: counted (and logged with
    // its exception; cluster mode additionally reports the skippedItems
    // scan metric)
    assert(graft.sources.GraftFetchSkips.sum(key) === before + 1,
      "skipped item must be counted")
  }

  test("items split into one partition per batch — executor-parallel fetch") {
    val df = read("a,b,c,d,e", Map("batchSize" -> "2"))
    assert(df.rdd.getNumPartitions === 3) // ceil(5/2)
  }

  test("column pruning reaches the reader (select materializes 1 field, not 9)") {
    val df = read("AAA").select("ticker")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
    assert(scan.isDefined, df.queryExecution.executedPlan.toString)
    assert(scan.get.scan.readSchema().fieldNames.toSeq === Seq("ticker"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("AAA", "AAA", "AAA"))
  }

  test("registry-named fetcher works for closure-based tests") {
    FetcherRegistry.register("spec-fake", FakeRowFetcher.rows)
    val df = spark.read.format("graft-fetch")
      .option("items", "XYZ").option("fetcher", "spec-fake").load()
    assert(df.collect().length === 3)
  }

  test("source feeds the full E1 normalize/stamp pipeline end-to-end") {
    val df = Ingest.withDataproc(Ingest.ensureDateColumn(
      Ingest.normalizeColumns(read("AAA,BBB"))))
    assert(df.columns.contains("stock-splits"), "hyphen normalization")
    assert(df.columns.contains("dataproc"))
    assert(df.count() === 6)
  }

  // ---- FileBackedHttpFetcher: the concrete retry/backoff/rate-limit path

  private def writeServer(root: String, payloads: Map[String, Seq[String]],
      failFirst: Map[String, Int] = Map.empty): Unit = {
    payloads.foreach { case (item, lines) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"$item.csv"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    failFirst.foreach { case (item, n) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"$item.unavailable"),
        n.toString.getBytes("UTF-8"))
    }
  }

  private def readFiles(items: String, root: String,
      extra: Map[String, String] = Map.empty) = {
    var r = spark.read.format("graft-fetch")
      .option("items", items).option("fetchRoot", root)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.option("fetcherClass",
      classOf[graft.sources.FileBackedHttpFetcher].getName).load()
  }

  private val line = "2024-01-02,10.0,11.0,9.0,10.5,1000,0.0,0.0"

  test("file-backed fetcher: transient 503s are retried with backoff, then succeed") {
    val root = tmpDir("fetchsrv1")
    writeServer(root,
      payloads = Map("RET-A" -> Seq(line, line), "RET-B" -> Seq(line)),
      failFirst = Map("RET-A" -> 2)) // first two attempts 503
    val key = classOf[graft.sources.FileBackedHttpFetcher].getName
    val skipsBefore = graft.sources.GraftFetchSkips.sum(key)
    val rows = readFiles("RET-A,RET-B", root,
      Map("maxAttempts" -> "3", "backoffMs" -> "1")).collect()
    assert(rows.length === 3, "both items must deliver after retries")
    assert(rows.map(_.getString(8)).toSet === Set("RET-A", "RET-B"))
    assert(graft.sources.FetchTrace.attempts("RET-A") === 3,
      "two scripted failures + one success")
    assert(graft.sources.FetchTrace.attempts("RET-B") === 1)
    assert(graft.sources.GraftFetchSkips.sum(key) === skipsBefore,
      "a recovered item is not a skip")
  }

  test("file-backed fetcher: exhausted retries and 404s skip per-item; 404 burns no retries") {
    val root = tmpDir("fetchsrv2")
    writeServer(root,
      payloads = Map("EXH-A" -> Seq(line), "EXH-C" -> Seq(line)),
      failFirst = Map("EXH-A" -> 99)) // never recovers
    // EXH-B has no payload at all -> 404
    val key = classOf[graft.sources.FileBackedHttpFetcher].getName
    val skipsBefore = graft.sources.GraftFetchSkips.sum(key)
    val rows = readFiles("EXH-A,EXH-B,EXH-C", root,
      Map("maxAttempts" -> "3", "backoffMs" -> "1")).collect()
    assert(rows.map(_.getString(8)).toSet === Set("EXH-C"),
      "failed items are isolated, healthy item still delivers")
    assert(graft.sources.FetchTrace.attempts("EXH-A") === 3,
      "transient failure uses the full attempt budget")
    assert(graft.sources.FetchTrace.attempts("EXH-B") === 1,
      "a permanent 404 must not be retried")
    assert(graft.sources.GraftFetchSkips.sum(key) === skipsBefore + 2)
  }

  test("file-backed fetcher: a malformed payload skips immediately, burning no retries") {
    val root = tmpDir("fetchsrv4")
    writeServer(root, Map(
      "BAD-CSV" -> Seq("2024-01-02,not-a-number,1,2,3,4,5,6"),
      "OK-1" -> Seq(line)))
    val rows = readFiles("BAD-CSV,OK-1", root,
      Map("maxAttempts" -> "3", "backoffMs" -> "1")).collect()
    assert(rows.map(_.getString(8)).toSet === Set("OK-1"))
    assert(graft.sources.FetchTrace.attempts("BAD-CSV") === 1,
      "a deterministic parse failure must not be retried")
  }

  test("file-backed fetcher: minIntervalMs paces consecutive outbound requests") {
    val root = tmpDir("fetchsrv3")
    val items = Seq("P1", "P2", "P3", "P4")
    writeServer(root, items.map(_ -> Seq(line)).toMap)
    val t0 = System.nanoTime()
    val rows = readFiles(items.mkString(","), root,
      Map("minIntervalMs" -> "60", "batchSize" -> "16")).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(rows.length === 4)
    // 4 requests on ONE task (batchSize 16 -> single partition): three
    // inter-request gaps of >= 60 ms must be enforced
    assert(elapsedMs >= 180,
      s"pacing not enforced: 4 requests in ${elapsedMs}ms")
  }
}
