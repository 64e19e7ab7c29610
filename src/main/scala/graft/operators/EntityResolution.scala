package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: find records that NAME the same real-world thing
  * despite textual drift — the record-linkage counterpart to the
  * document-level near-dup family in [[Dedup]] (catalog merge, vendor
  * master reconciliation, and training-corpus metadata dedup all reduce
  * to it). The reference's data model carries exactly this hazard (its
  * ticker/segment dimensions arrive as free text from an external feed,
  * `/root/reference/src/jobs/b3_collector.py` fetch loop), so the
  * operator belongs in the library's core surface.
  *
  * Two scale disciplines compose here:
  *
  *  1. DISTINCT-VALUE LINKAGE. The naive form compares RECORDS (O(rows²)
  *     edit distances — the canonical job that never finishes at 100 TB,
  *     and even its output grows quadratically with duplication). But
  *     names live in a domain far smaller than the record count, so the
  *     operator canonicalizes FIRST — one map-side-combined aggregate to
  *     (distinct name, record count) — and links NAMES. Work and output
  *     are bounded by the name-domain size; the counts carried through
  *     say how many records each link resolves.
  *  2. BLOCKING. Within the name domain, the comparator only runs inside
  *     blocks keyed by each name's RAREST token (global document
  *     frequency over distinct names, ties broken lexicographically) —
  *     the same df-ranked-rarest-first insight as the AllPairs prefix
  *     order in [[Dedup.prefixFilterJoin]]: near-duplicate names share
  *     most tokens, so they almost surely share their rarest one, while
  *     stopword-like tokens (huge df) are nobody's block key, which
  *     keeps blocks bounded on skewed vocabularies. Recall is heuristic
  *     (drift that hits the rarest token itself escapes the block) — the
  *     standard blocking tradeoff, recovered in practice by a second
  *     pass on the 2nd-rarest key; the single-pass form is registered
  *     because the oracle reproduces its semantics exactly.
  *
  * The rank-1 block pick is a per-name `min(struct(df, token))` — map-
  * side combinable, no window, no second exchange — and the candidate
  * join is EQUI on the block key with the name inequality and the
  * Levenshtein threshold evaluated inside the join condition, so no
  * unfiltered pair ever materializes. Levenshtein is Spark's codegen'd
  * built-in (unit-cost edit distance — identical semantics in DuckDB),
  * never a UDF.
  */
object EntityResolution {

  /** All DISTINCT part-name pairs sharing their rarest token whose
    * Levenshtein distance is at most `maxDistance`, with each name's
    * record count — (name_a, name_b, dist, n_a, n_b), lexicographically
    * ordered so each unordered pair surfaces exactly once.
    */
  def blockedNamePairs(part: DataFrame, maxDistance: Int = 3): DataFrame = {
    val names = part
      .filter(col("p_name").isNotNull)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_records"))
    val tok = names.select(col("name"), col("n_records"),
      explode(split(col("name"), " ")).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val blocked = tok.join(dfreq, "token")
      .groupBy("name")
      .agg(min(struct(col("df"), col("token"))).as("m"),
        max(col("n_records")).as("n_records"))
      .select(col("name"), col("n_records"), col("m.token").as("block_key"))
    blocked.as("a").join(blocked.as("b"),
        col("a.block_key") === col("b.block_key") &&
          col("a.name") < col("b.name") &&
          levenshtein(col("a.name"), col("b.name"), maxDistance) >= 0)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name"), maxDistance)
          .cast("long").as("dist"),
        col("a.n_records").as("n_a"), col("b.n_records").as("n_b"))
      .orderBy("name_a", "name_b")
  }

  /** MULTI-FIELD MATCH SCORING of blocked candidate pairs — the
    * classify step that follows [[blockedNamePairs]]'s blocking step in
    * every record-linkage pipeline (Fellegi-Sunter's weighted field
    * agreement, rendered with INTEGER weights so the score is
    * engine-exact): each candidate pair accumulates points for brand
    * equality (+30), type equality (+25), size within ±1 (+15), and
    * name closeness (+10 per unspent edit under `maxDistance`).
    * `is_match` is the ≥ 70 decision; only pairs scoring ≥ 40 emit, so
    * the output carries
    * the decision boundary, not the candidate noise floor.
    *
    * Each distinct name is represented by its min-partkey record's
    * attributes (deterministic), so the pair space stays ∝ distinct
    * names — the same contract as the blocking step.
    *
    * Scale shape: inherits blocking from the rarest-name-token scheme
    * (df-ranked, one equi-join, no cartesian); scoring is a codegen'd
    * projection over the candidate frame.
    */
  def erMatchScores(part: DataFrame, maxDistance: Int = 6): DataFrame = {
    val reps = part
      .filter(col("p_name").isNotNull)
      .groupBy(col("p_name").as("name"))
      .agg(min(struct(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))).as("r"))
      .select(col("name"), col("r.p_partkey").as("pk"),
        col("r.p_brand").as("brand"), col("r.p_type").as("typ"),
        col("r.p_size").as("size"))
    val tok = reps.select(col("name"),
      explode(split(col("name"), " ")).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val blocked = tok.join(dfreq, "token")
      .groupBy("name")
      .agg(min(struct(col("df"), col("token"))).as("m"))
      .select(col("name"), col("m.token").as("block_key"))
      .join(reps, "name")
    val pairs = blocked.as("a").join(blocked.as("b"),
        col("a.block_key") === col("b.block_key") &&
          col("a.name") < col("b.name") &&
          levenshtein(col("a.name"), col("b.name"), maxDistance) >= 0)
      .select(col("a.pk").as("pk_a"), col("b.pk").as("pk_b"),
        levenshtein(col("a.name"), col("b.name"), maxDistance)
          .cast("long").as("dist"),
        (when(col("a.brand") === col("b.brand"), 30L).otherwise(0L) +
          when(col("a.typ") === col("b.typ"), 25L).otherwise(0L) +
          when(abs(col("a.size") - col("b.size")) <= 1, 15L).otherwise(0L))
          .as("field_score"))
    pairs
      .select(col("pk_a"), col("pk_b"), col("dist"),
        (col("field_score") +
          (lit(maxDistance.toLong) - col("dist")) * 10L).as("score"))
      .filter(col("score") >= 40L)
      .withColumn("is_match", (col("score") >= 70L).cast("long"))
      .orderBy("pk_a", "pk_b")
  }
}
