package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** End-to-end training-data preparation — the capstone composition of the
  * pipeline tier, every stage of which is individually oracle-proven:
  *
  *  1. deterministic content-addressed SAMPLE (t7/t8 machinery) — a
  *     reproducible subset, stable across runs and partitionings;
  *  2. quality + language GATE (d6) — codegen'd column predicates over
  *     one scan;
  *  3. exact DEDUP (d1) — min-doc_id representative per identical text;
  *  4. near-dup CLUSTER representatives (d3b + d7) — LSH pairs at
  *     J ≥ 0.9, connected components, keep only each cluster's min id
  *     (transitive closure: A≈B≈C collapses to one survivor even when
  *     A,C never pair directly);
  *  5. token-budget PACKING (t10) — contiguous 512-token chunks per
  *     language stream via a keyed window.
  *
  * Scale shape is inherited from the stages: map-side sample/gate, one
  * dedup shuffle, banded LSH (no all-pairs), O(log² n) star rounds, and
  * keyed windows — no stage concentrates the corpus on one task.
  */
object TrainingPipeline {

  def trainingPrep(documents: DataFrame, sampleSixteenths: Int = 12,
      minQuality: Int = 3, nearDupThreshold: Double = 0.9,
      budgetTokens: Int = 512,
      evalSet: Option[DataFrame] = None): DataFrame = {
    // 1-2: sample + gate (single scan, all codegen'd predicates)
    val gated = documents
      .filter(TextOps.hexNibble("doc_id") < sampleSixteenths)
      .filter(qualityScore(col("text")) >= minQuality &&
        langIdHeuristic(col("text")) === "en")
    // 2b (optional): benchmark DECONTAMINATION (d9) — drop curated docs
    // sharing any 5-gram with the held-out eval set, before any dedup
    // (identical texts share contamination status, so ordering vs the
    // exact dedup is immaterial; near-dup clusters can legitimately
    // split when a contaminated bridge doc leaves)
    val curated = evalSet match {
      case Some(ev) =>
        val contaminated = Decontam.decontaminate(gated, ev)
          .select("doc_id")
        gated.join(contaminated, Seq("doc_id"), "left_anti")
      case None => gated
    }
    // 3: exact dedup; representative carries its own lang label
    // materialized once: the survivor set feeds LSH signature building,
    // candidate shingle verification AND the representative join — left
    // lazy, the sample+gate+dedup lineage would execute three times
    val deduped = curated
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min(tokenCount(col("text"))).as("nt"))
      .select(col("doc_id"), col("text"), col("lang"), col("nt"))
      .localCheckpoint(true)
    // 4: near-dup clusters among the survivors, keep component minima
    val edges = Dedup.nearDupPairs(deduped, nearDupThreshold,
      materializeCandidates = true)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = Dedup.connectedComponents(edges)
    val reps = deduped
      .join(labels, col("doc_id") === col("node"), "left")
      .filter(coalesce(col("component"), col("doc_id")) === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("nt"))
    // 5: pack into token-budget chunks per language stream — the same
    // packing definition as t10 (TextOps.packTokenCounts), not a copy
    TextOps.packTokenCounts(
      reps.select(col("doc_id"), col("lang"), col("nt").cast("int").as("n_tokens")),
      budgetTokens)
      .orderBy("doc_id")
  }
}
