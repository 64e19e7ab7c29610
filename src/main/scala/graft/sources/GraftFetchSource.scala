package graft.sources

import java.util

import scala.util.Try

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.slf4j.LoggerFactory

/** Per-item batch fetcher contract for [[GraftFetchProvider]]. A real
  * implementation wraps an API client (the reference's yfinance call,
  * `/root/reference/src/glue/b3_collector.py:34-53`); it must have a
  * no-arg constructor so executors can instantiate it from the class name
  * without shipping a closure.
  */
trait RowFetcher extends Serializable {
  /** Called once per reader with the scan's options (keys lowercased)
    * before any [[fetch]] — how a no-arg-constructed fetcher receives
    * endpoint/retry/rate configuration from `spark.read.option(...)`.
    */
  def init(options: Map[String, String]): Unit = ()
  def fetch(item: String): Seq[Row]
}

/** Process-local fetcher registry — the TEST path (closures can't travel
  * to real executors; in local mode the registry is visible to tasks).
  * Production readers use the `fetcherClass` option instead.
  */
object FetcherRegistry {
  private val fetchers =
    new java.util.concurrent.ConcurrentHashMap[String, String => Seq[Row]]()
  def register(name: String, f: String => Seq[Row]): Unit = fetchers.put(name, f)
  def get(name: String): String => Seq[Row] = {
    val f = fetchers.get(name)
    require(f != null, s"no fetcher registered under '$name'")
    f
  }
}

/** DataSourceV2 batch source for the S1 ingest analog:
  * `spark.read.format("graft-fetch").option("items", "a,b,c")...`.
  *
  * Scale shape: the item list is split into `batchSize` groups, ONE
  * InputPartition each, so fetches run on executors in parallel — the
  * reference fetches sequentially on its driver, which is the scalability
  * cliff SURVEY.md §3.E1 calls out. Per-item failures are isolated
  * (skip, not fail), matching `b3_collector.py:56-68`. Column pruning is
  * pushed into the reader: a `select(ticker)` materializes 1 field per
  * row, not 9.
  *
  * Options: `items` (comma-separated, required), `fetcherClass` (FQCN of
  * a [[RowFetcher]], the cluster-safe path) or `fetcher` (registry name,
  * test path), `batchSize` (items per partition, default 16).
  */
class GraftFetchProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fetch"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Ingest.rawSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftFetchTable(schema)
}

private[sources] class GraftFetchTable(tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "graft-fetch"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFetchScanBuilder(tableSchema, options)
}

private[sources] class GraftFetchScanBuilder(
    fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep fullSchema field order so reader-side projection is stable
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = "graft-fetch"

  override def planInputPartitions(): Array[InputPartition] = {
    val items = Option(options.get("items"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-fetch requires an 'items' option"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val batchSize = options.getInt("batchSize", 16)
    val fetcherClass = Option(options.get("fetcherClass"))
    val registryName = Option(options.get("fetcher"))
    require(fetcherClass.isDefined || registryName.isDefined,
      "graft-fetch requires 'fetcherClass' or 'fetcher'")
    // lowercased option map rides along so class-named fetchers can
    // configure themselves (retry budget, rate limit, endpoint root)
    // without a closure; CaseInsensitiveStringMap already lowercases.
    // Scan-level keys are STRIPPED first — 'items' in particular is the
    // full item list, and copying it into every partition would grow the
    // task payload O(partitions × items) for data no fetcher reads.
    val scanKeys = Set("items", "batchsize", "fetcherclass", "fetcher")
    val opts = {
      val m = scala.collection.mutable.Map[String, String]()
      options.entrySet().forEach { e =>
        val k = e.getKey.toLowerCase
        if (!scanKeys.contains(k)) m(k) = e.getValue
      }
      m.toMap
    }
    items.grouped(batchSize)
      .map(g => GraftFetchPartition(g, fetcherClass, registryName, opts))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFetchReaderFactory(fullSchema, required)

  // Skipped-item count surfaces as a first-class scan metric (SQL UI /
  // metrics sink), so partial ingest failure is an observable signal,
  // not a silent row-count shortfall.
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new SkippedItemsMetric)
}

private[sources] class SkippedItemsMetric extends CustomSumMetric {
  override def name(): String = "skippedItems"
  override def description(): String = "fetch items skipped after an exception"
}

private[sources] case class SkippedItemsTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "skippedItems"
}

/** Process-local skip counters, KEYED by fetcher identity (registry name
  * or fetcher class name): test-visible in local mode (executors share the
  * JVM) without cross-talk between concurrent scans that use different
  * fetchers. Counters are cumulative for a fetcher's lifetime — tests
  * register a unique fetcher name and read deltas on it. Cluster-mode
  * observability goes through the custom scan metric instead.
  */
object GraftFetchSkips {
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
  private[sources] def add(fetcherKey: String): Unit =
    counts.computeIfAbsent(fetcherKey, _ => new java.util.concurrent.atomic.LongAdder)
      .increment()
  /** Cumulative skips recorded for one fetcher identity. */
  def sum(fetcherKey: String): Long = {
    val c = counts.get(fetcherKey)
    if (c == null) 0L else c.sum()
  }
}

private[sources] case class GraftFetchPartition(
    items: Array[String],
    fetcherClass: Option[String],
    registryName: Option[String],
    options: Map[String, String] = Map.empty) extends InputPartition

private[sources] class GraftFetchReaderFactory(
    fullSchema: StructType, requiredSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftFetchPartition]
    val fetcherKey = part.fetcherClass.orElse(part.registryName).get
    val fetch: String => Seq[Row] = part.fetcherClass match {
      case Some(cls) =>
        val f = Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[RowFetcher]
        f.init(part.options)
        f.fetch
      case None => FetcherRegistry.get(part.registryName.get)
    }
    val requiredIdx = requiredSchema.fieldNames
      .map(fullSchema.fieldIndex).toIndexedSeq
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(requiredSchema)
    val log = LoggerFactory.getLogger(classOf[GraftFetchReaderFactory])
    val skipped = new java.util.concurrent.atomic.LongAdder
    // S2 isolation — but never SILENT: each skipped item is logged with
    // its exception and counted into the scan's skippedItems metric (the
    // reference collector logs every skip, `b3_collector.py:64-66`).
    val it: Iterator[InternalRow] = part.items.iterator
      .flatMap { i =>
        Try(fetch(i)) match {
          case scala.util.Success(rows) => rows
          case scala.util.Failure(e) =>
            log.warn(s"graft-fetch: skipping item '$i' after ${e.getClass.getName}: ${e.getMessage}")
            skipped.increment()
            GraftFetchSkips.add(fetcherKey)
            Seq.empty
        }
      }
      .map { row =>
        toCatalyst(Row.fromSeq(requiredIdx.map(row.get)))
          .asInstanceOf[InternalRow]
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
      override def currentMetricsValues(): Array[CustomTaskMetric] =
        Array(SkippedItemsTaskMetric(skipped.sum()))
    }
  }
}
