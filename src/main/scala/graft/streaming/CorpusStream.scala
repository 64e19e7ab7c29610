package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup

/** Streaming CORPUS INGESTION with fuzzy dedup at the gate: each
  * micro-batch of documents is deduplicated (exact, then near-dup within
  * the batch, then near-dup against everything already ingested via the
  * persisted band index) and only the novel survivors are appended to the
  * corpus — the continuous form of the d10 incremental-dedup operator,
  * and the shape a crawl-ingest pipeline runs at 100 TB: per batch the
  * work is |batch| + collisions, never a corpus rescan.
  *
  * Exactly-once without a transactional store (the writeBatchIdempotent
  * argument, extended to a DERIVED side output):
  *  - corpus rows AND index rows land under `batch_id=<id>` partitions
  *    via dynamic partition overwrite — a replayed batch overwrites
  *    exactly its own partitions;
  *  - the dedup-vs-history read EXCLUDES the current batch_id (partition
  *    pruning), so a replayed batch never matches its own previous
  *    attempt's rows and reproduces the same survivor set — the sink is
  *    a fixpoint of its own replay.
  */
object CorpusStream {

  /** One micro-batch: dedup within the batch, dedup vs prior ingested
    * state, append survivors + their band-index rows under this batch_id.
    */
  def dedupIngestBatch(spark: SparkSession, batch: Dataset[Row], batchId: Long,
      corpusDir: String, indexDir: String, threshold: Double = 0.9): Unit = {
    val docs = batch.toDF().select("doc_id", "text")
    // exact dedup keeps the deterministic min-id representative
    val exact = Dedup.exactDedup(docs)
    // near-dup within the batch: greedy drop of the larger id of a pair
    // (pairs are emitted doc_a < doc_b)
    val nearB = Dedup.nearDupPairs(exact, threshold, materializeCandidates = true)
      .select(col("doc_b").as("doc_id")).distinct()
    val inBatchUnique = exact.join(nearB, Seq("doc_id"), "left_anti")
    // vs prior state: candidate bands from the STORED index, excluding
    // this batch_id so an at-least-once replay never matches itself
    // "state exists" = the index dir has content (a bare pre-created
    // empty directory must read as no-prior-state, not a schema error)
    def hasData(dir: String): Boolean = {
      val fs = new java.io.File(dir).listFiles()
      fs != null && fs.nonEmpty
    }
    val survivors =
      if (hasData(indexDir)) {
        val priorIndex = spark.read.parquet(indexDir)
          .filter(col("batch_id") =!= batchId)
        val priorCorpus = spark.read.parquet(corpusDir)
          .filter(col("batch_id") =!= batchId)
        val dupNew = Dedup.incrementalNearDups(
            priorIndex, priorCorpus, inBatchUnique, threshold)
          .select(col("new_doc").as("doc_id")).distinct()
        inBatchUnique.join(dupNew, Seq("doc_id"), "left_anti")
      } else inBatchUnique
    // materialize before the writes: the corpus append's lineage reads
    // the corpus directory being written (other partitions)
    val kept = survivors.localCheckpoint(true)
    def appendIdempotent(df: DataFrame, dir: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(dir)
    appendIdempotent(kept, corpusDir)
    appendIdempotent(Dedup.bandIndex(kept), indexDir)
  }

  def runDedupIngestSink(spark: SparkSession, streamed: DataFrame,
      corpusDir: String, indexDir: String, checkpoint: String,
      threshold: Double = 0.9): Unit = {
    val q = streamed.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        dedupIngestBatch(spark, batch, batchId, corpusDir, indexDir, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
