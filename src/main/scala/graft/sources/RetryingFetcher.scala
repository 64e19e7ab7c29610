package graft.sources

import org.apache.spark.sql.Row

/** Transport error with an HTTP-shaped status, so retry policy can
  * distinguish transient failures (5xx/429: retry) from permanent ones
  * (404: skip immediately — retrying a missing ticker wastes the rate
  * budget the way the reference's yfinance loop would).
  */
class SimulatedHttpException(val status: Int, msg: String)
    extends RuntimeException(s"HTTP $status: $msg")

/** Retry/backoff/rate-limit skeleton for [[RowFetcher]] implementations —
  * the per-item resilience the reference's collector delegates to the
  * yfinance client (`/root/reference/src/glue/b3_collector.py:37-68`
  * catches-and-skips; the client library does the throttling). Concrete
  * fetchers implement only [[fetchOnce]].
  *
  * Policy (configured via `spark.read.option(...)`, read in [[init]]):
  *  - `maxAttempts` (default 3): per-item attempt budget. Exhaustion
  *    rethrows, landing in the reader's skip-and-count path — isolation
  *    stays per-item, never per-partition.
  *  - `backoffMs` (default 50): sleep before attempt n is
  *    backoffMs·2ⁿ⁻¹ — exponential, deterministic (no jitter: one
  *    fetcher per task is pacing itself, not dodging a thundering herd).
  *  - `minIntervalMs` (default 0 = off): minimum spacing between
  *    consecutive OUTBOUND requests (retries included) from this
  *    fetcher. Pacing is per task BY DESIGN: an executor-parallel scan's
  *    aggregate rate is `parallelism / minIntervalMs`, so the cluster-
  *    wide budget is set by sizing `batchSize` (partition count) times
  *    this interval — the knob a 100k-item ingest actually tunes.
  */
abstract class RetryingFetcher extends RowFetcher {
  private var maxAttempts = 3
  private var backoffMs = 50L
  private var minIntervalMs = 0L
  private var lastRequestNanos = Long.MinValue

  override final def init(options: Map[String, String]): Unit = {
    maxAttempts = options.getOrElse("maxattempts", "3").toInt
    backoffMs = options.getOrElse("backoffms", "50").toLong
    minIntervalMs = options.getOrElse("minintervalms", "0").toLong
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    onInit(options)
  }

  /** Subclass configuration hook (options keys are lowercased). */
  protected def onInit(options: Map[String, String]): Unit = ()

  /** One attempt — the actual transport call. */
  protected def fetchOnce(item: String): Seq[Row]

  /** Retry policy: transient vs permanent. Default retries everything
    * except an HTTP-shaped 4xx (429 Too Many Requests excepted).
    */
  protected def isRetryable(e: Throwable): Boolean = e match {
    case h: SimulatedHttpException =>
      h.status >= 500 || h.status == 429
    case _ => true
  }

  override final def fetch(item: String): Seq[Row] = {
    var attempt = 1
    while (true) {
      pace()
      try {
        return fetchOnce(item)
      } catch {
        // NonFatal only: InterruptedException (a Spark task KILL must
        // not be survived by a retry loop), VM errors, and linkage
        // errors propagate immediately
        case e if scala.util.control.NonFatal(e) &&
            attempt < maxAttempts && isRetryable(e) =>
          Thread.sleep(backoffMs << (attempt - 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Enforce `minIntervalMs` between outbound requests. */
  private def pace(): Unit = if (minIntervalMs > 0) {
    val sinceMs = (System.nanoTime() - lastRequestNanos) / 1000000L
    if (lastRequestNanos != Long.MinValue && sinceMs < minIntervalMs)
      Thread.sleep(minIntervalMs - sinceMs)
    lastRequestNanos = System.nanoTime()
  }
}

/** Process-local attempt trace, keyed by item — the local-mode test
  * observability companion of [[GraftFetchSkips]] (real clusters read the
  * scan's `skippedItems` metric; attempts per item are a log concern).
  */
object FetchTrace {
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
  private[sources] def add(item: String): Unit =
    counts.computeIfAbsent(item, _ => new java.util.concurrent.atomic.LongAdder)
      .increment()
  def attempts(item: String): Long = {
    val c = counts.get(item)
    if (c == null) 0L else c.sum()
  }
}

/** File-backed simulated-HTTP fetcher — the concrete [[RowFetcher]] a
  * user of the reference would start from (swap [[fetchOnce]]'s file read
  * for the real HTTP GET; retry/backoff/rate policy and the OHLCV row
  * shape stay). The sandbox has no network, so the "server" is a
  * directory (option `fetchRoot`):
  *
  *  - `<root>/<item>.csv` — the payload: comma-separated
  *    `date,open,high,low,close,volume,dividends,stock splits` lines
  *    (the item itself becomes the `ticker` column, as in the
  *    reference's `df['Ticker'] = ticker`); absent file → 404, which is
  *    permanent and skips without burning retries;
  *  - `<root>/<item>.unavailable` — transient-failure script: an integer
  *    N makes the first N attempts fail 503, so retry-then-succeed and
  *    retries-exhausted are both exercisable deterministically.
  */
class FileBackedHttpFetcher extends RetryingFetcher {
  private var root = ""
  private val seen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()

  override protected def onInit(options: Map[String, String]): Unit =
    root = options.getOrElse("fetchroot",
      throw new IllegalArgumentException(
        "FileBackedHttpFetcher requires a 'fetchRoot' option"))

  override protected def fetchOnce(item: String): Seq[Row] = {
    FetchTrace.add(item)
    val attempt = seen.merge(item, 1, (a, b) => a + b).toInt
    val failSpec = new java.io.File(root, s"$item.unavailable")
    if (failSpec.isFile) {
      val failFirst = new String(java.nio.file.Files.readAllBytes(
        failSpec.toPath)).trim.toInt
      if (attempt <= failFirst)
        throw new SimulatedHttpException(503,
          s"service unavailable for '$item' (scripted attempt $attempt/$failFirst)")
    }
    val payload = new java.io.File(root, s"$item.csv")
    if (!payload.isFile)
      throw new SimulatedHttpException(404, s"no payload for '$item'")
    val src = scala.io.Source.fromFile(payload, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val f = line.split(",").map(_.trim)
      // a malformed payload is PERMANENT (the file won't change between
      // attempts): classify as a 422 so the retry policy skips it
      // immediately instead of burning the backoff/rate budget on a
      // deterministic failure
      try Row(
        java.sql.Timestamp.valueOf(java.time.LocalDate.parse(f(0)).atStartOfDay()),
        f(1).toDouble, f(2).toDouble, f(3).toDouble, f(4).toDouble,
        f(5).toLong, f(6).toDouble, f(7).toDouble, item)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new SimulatedHttpException(422,
            s"unparseable payload line for '$item': ${e.getMessage}")
      }
    }.toList
    finally src.close()
  }
}
