package graft.jobs

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability: in-flight row accounting via `observe()`
  * (CollectMetrics — aggregates computed ON the data as it streams past,
  * zero extra scans or shuffles) plus a [[QueryExecutionListener]] that
  * collects those observations with per-action wall time and failures.
  *
  * This is the production alternative to the reference's eager
  * `count()` validation calls (`b3_transform.py:242-352` — 7+ recounts,
  * each a full lineage re-execution): one pass, same numbers, plus
  * failure capture. At 100 TB a recount is hours; an observation is free.
  */
object Observability {

  /** Attach a named row/null observation to a frame — readable by any
    * listener after the next action touches the frame.
    */
  def observeRows(df: DataFrame, name: String, notNullCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      count(col(notNullCol)).as(s"${notNullCol}_not_null"))

  final case class ActionRecord(funcName: String, durationNs: Long,
    observed: Map[String, Row], error: Option[String])

  /** Listener recording every action's duration, observed metrics, and
    * failure; register via `spark.listenerManager.register(...)`.
    * Callbacks are delivered asynchronously on the listener bus — tests
    * and schedulers should poll [[records]] rather than assume
    * synchronous delivery.
    */
  final class MetricsRecorder extends QueryExecutionListener {
    private val queue = new ConcurrentLinkedQueue[ActionRecord]()

    def records: Seq[ActionRecord] = queue.asScala.toSeq
    def clear(): Unit = queue.clear()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      queue.add(ActionRecord(funcName, durationNs, qe.observedMetrics, None))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      queue.add(ActionRecord(funcName, 0L, Map.empty,
        Some(exception.getClass.getName)))
  }

  /** Convenience: register a fresh recorder on the session. */
  def register(spark: SparkSession): MetricsRecorder = {
    val rec = new MetricsRecorder
    spark.listenerManager.register(rec)
    rec
  }
}
