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
    // near-dup within the batch: ONE representative (the component min)
    // per transitive near-dup cluster — the d7 convention. A greedy
    // drop-doc_b rule would over-delete chains (a~b, b~c, a!~c leaves
    // cluster {b,c} with no representative once b goes).
    val nearEdges = Dedup.nearDupPairs(exact, threshold, materializeCandidates = true)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = Dedup.connectedComponents(nearEdges)
    val inBatchUnique = exact
      .join(labels, col("doc_id") === col("node"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .select("doc_id", "text")
    // vs prior state: candidate bands from the STORED index, excluding
    // this batch_id so an at-least-once replay never matches itself.
    // "state exists" = the index dir holds committed content beyond
    // marker files (a pre-created empty dir, or a zero-survivor batch
    // that wrote only _SUCCESS, must read as no-prior-state, not as a
    // schema error). Probed through the Hadoop FileSystem API so the
    // check holds on hdfs://s3a:// deployments, not just local paths.
    def hasData(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.exists(p) && fs.listStatus(p).exists(
        st => !st.getPath.getName.startsWith("_"))
    }
    val survivors =
      if (hasData(indexDir)) {
        val priorIndex = spark.read.parquet(indexDir)
          .filter(col("batch_id") =!= batchId)
        val priorCorpus = spark.read.parquet(corpusDir)
          .filter(col("batch_id") =!= batchId)
        val dupNew = Dedup.incrementalNearDups(
            priorIndex, priorCorpus, inBatchUnique, threshold,
            materializeCandidates = true)
          .select(col("new_doc").as("doc_id")).distinct()
        inBatchUnique.join(dupNew, Seq("doc_id"), "left_anti")
      } else inBatchUnique
    // materialize before the writes: the corpus append's lineage reads
    // the corpus directory being written (other partitions)
    val kept = survivors.localCheckpoint(true)
    EventStream.writeBatchPartitioned(kept, batchId, corpusDir)
    EventStream.writeBatchPartitioned(Dedup.bandIndex(kept), batchId, indexDir)
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
