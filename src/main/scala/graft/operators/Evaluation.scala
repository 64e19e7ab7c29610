package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model- and feature-evaluation primitives over corpus tables — the
  * measurement side of a training-data pipeline (does a cheap signal
  * predict the label? which features are associated with a class?),
  * kept in exact integer / decimal arithmetic so the verdicts are
  * engine-portable.
  *
  * Reference analog: the refined-layer sanity aggregations in
  * `b3_transform.py:242-352` gate a batch on counts; these operators
  * gate a CURATION RULE on its measured predictive value instead.
  */
object Evaluation {

  /** Exact AUC via the Mann–Whitney rank-sum identity, per group — the
    * standard check that a heuristic quality score actually separates a
    * binary label (here: does document length predict `lang = 'en'`,
    * per source). No sampling, no FP ranks:
    *
    *   U = #{(pos, neg) pairs with score_pos > score_neg} + ties/2
    *   AUC = U / (n_pos · n_neg)
    *
    * computed without materializing pairs, from per-score counts:
    * with p_s / n_s the positive/negative counts AT score s and cn_s the
    * negatives strictly below s,  2U = Σ_s p_s · (2·cn_s + n_s).  The 2×
    * form keeps tie halves integral; `auc_permille` is the floor-integer
    * ⌊1000·2U / (2·n_pos·n_neg)⌋, and `u2` rides along so a consumer can
    * recover full precision.
    *
    * Scale shape: the input collapses to DISTINCT (group, score) rows in
    * one map-side-combining aggregate (state ∝ score cardinality, not
    * rows); the cumulative window and the final per-group aggregate both
    * ride the same group partitioning. Bounds: u2 ≤ 2·n_pos·n_neg < 2N²,
    * ×1000 still far inside BIGINT for any per-group N < 2·10⁷ — and a
    * 100 TB corpus shards this per (group, day) long before that.
    */
  def aucStats(documents: DataFrame): DataFrame = {
    val perScore = documents
      .select(col("source"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
      .groupBy("source", "score")
      .agg(sum(col("is_pos")).as("p"),
        sum(lit(1L) - col("is_pos")).as("n"))
    val below = Window.partitionBy("source").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cn", coalesce(sum(col("n")).over(below), lit(0L)))
      .groupBy("source")
      .agg(sum(col("p")).as("n_pos"),
        sum(col("n")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cn") + col("n"))).as("u2"))
      .select(col("source"), col("n_pos"), col("n_neg"), col("u2"),
        // nullif: a single-class group has no pairs to rank — NULL AUC on
        // both engines (ANSI div would error)
        expr("u2 * 1000L div nullif(2L * n_pos * n_neg, 0L)").as("auc_permille"))
      .orderBy("source")
  }

  /** Chi-squared token↔label association (feature selection for corpus
    * curation): the top-k tokens whose PRESENCE in a document is most
    * associated with `lang = 'en'`, scored by the 2×2 chi-squared
    * statistic in exact arithmetic:
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * with a = en docs containing the token, b = other docs containing it,
    * c/d the complements. Emitted as `chi2_micro` = ⌊10⁶·χ²⌋ — the
    * numerator N·(ad−bc)²·10⁶ can reach ~10³⁵ at corpus scale, so the
    * product is built in DECIMAL(38,0) (Tungsten's 16-byte decimal, still
    * codegen'd) and only the quotient, ≤ 10⁶·N, returns to BIGINT. The
    * DuckDB oracle mirrors with HUGEINT. Sign of (ad−bc) rides along as
    * `direction` so anti-associated tokens are distinguishable.
    *
    * Scale shape: presence = per-doc DISTINCT tokens (one explode, then
    * ONE map-side-combining aggregate keyed by token — state ∝ vocab);
    * the two corpus totals are driver-side scalars embedded as literals
    * (the collocations/BPE precedent); top-k is TakeOrderedAndProject,
    * never a global sort.
    */
  def chi2Association(documents: DataFrame, minDf: Long = 50L,
      k: Int = 25): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val labeled = documents.select(
      when(col("lang") === "en", 1L).otherwise(0L).as("is_en"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val totals = documents
      .agg(count(lit(1)).cast("long"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long"))
      .head()
    val (nDocs, nEn) = (totals.getLong(0), totals.getLong(1))
    labeled
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("is_en")).as("a"))
      // df = N would zero the (c+d) factor — a token in EVERY document
      // carries no signal anyway, and the guard keeps the floor division
      // total on both engines (Spark nulls on /0, DuckDB errors)
      .filter(col("df") >= minDf && col("df") < nDocs)
      .select(col("tok"), col("a"), (col("df") - col("a")).as("b"),
        (lit(nEn) - col("a")).as("c"),
        (lit(nDocs - nEn) - col("df") + col("a")).as("d"))
      .withColumn("det", col("a") * col("d") - col("b") * col("c"))
      .withColumn("chi2_micro", expr(
        s"""CAST(CAST(1000000L * ${nDocs}L AS DECIMAL(38,0)) * det * det
           |  div (CAST((a + b) AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))
           |  AS BIGINT)""".stripMargin))
      .select(col("tok"), col("a").as("n_en_with"), col("b").as("n_other_with"),
        col("chi2_micro"), signum(col("det")).cast("long").as("direction"))
      .orderBy(desc("chi2_micro"), col("tok"))
      .limit(k)
  }

  /** CALIBRATION table for a heuristic score: empirical P(label) per
    * fixed-width score bin — the companion readout to [[aucStats]] (AUC
    * says the score ranks; the calibration table says what a given score
    * VALUE means). Integer floor bins and floor-permille rates, one
    * map-side-combining aggregate keyed by bin (state ∝ bins).
    */
  def calibrationBins(documents: DataFrame, binWidth: Long = 100L): DataFrame =
    documents
      .select(expr(s"n_chars div ${binWidth}L").as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000L div n").as("pos_permille"))
      .orderBy("bin")

  /** PRECISION/RECALL sweep: the confusion matrix and floor-permille
    * precision/recall of the rule "score ≥ t ⇒ positive" at each
    * threshold — the operating-point table behind choosing a filter
    * cutoff. Each input row fans out to |thresholds| (a handful of)
    * counting rows in the same scan; partial aggregation collapses the
    * fan-out map-side, so the exchange carries ∝ |thresholds| rows.
    * A threshold above every score yields tp+fp = 0 and a NULL precision
    * (both engines null on integer /0) — visible, not masked.
    */
  def prCurve(documents: DataFrame,
      thresholds: Seq[Long] = Seq(100L, 200L, 300L, 400L, 600L, 800L)): DataFrame =
    documents
      .select(col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(
        sum(when(col("score") >= col("threshold"), col("is_pos"))
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("threshold"), lit(1L) - col("is_pos"))
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("threshold"), col("is_pos"))
          .otherwise(0L)).as("fn"),
        sum(when(col("score") < col("threshold"), lit(1L) - col("is_pos"))
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        // nullif: ANSI div errors on /0; DuckDB nulls — align on NULL
        expr("tp * 1000L div nullif(tp + fp, 0L)").as("precision_permille"),
        expr("tp * 1000L div nullif(tp + fn, 0L)").as("recall_permille"))
      .orderBy("threshold")

  /** JOIN-CARDINALITY ESTIMATION contract (the statistic a cost-based
    * optimizer runs on): for the skewed self-equi-join events ⋈ events on
    * user_id, compare
    *
    *   exact        = Σ_k c(k)²                 (ground truth)
    *   est_uniform  = ⌊n² / ndv⌋                (the textbook CBO formula —
    *                                             blind to skew)
    *   est_hybrid   = Σ_{top-h} c(k)² + ⌊n_tail² / ndv_tail⌋
    *                                            (heavy hitters kept exact,
    *                                             uniformity only for the tail
    *                                             — the End-Biased-Histogram
    *                                             estimate)
    *
    * plus each estimate's floor-permille ratio to exact — the measured
    * case for why engine statistics must carry heavy hitters, not just
    * (n, ndv). Everything is integer arithmetic on exact counts, so the
    * contract is engine-portable; at 100 TB the per-key count table is
    * the only shuffled state (∝ ndv) and the top-h pick is a
    * TakeOrderedAndProject.
    */
  def joinCardinalityEstimate(events: DataFrame, topH: Int = 20): DataFrame = {
    val counts = events.filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    val heavy = counts.orderBy(desc("c"), col("user_id")).limit(topH)
      .agg(coalesce(sum(col("c") * col("c")), lit(0L)).as("heavy_pairs"),
        coalesce(sum(col("c")), lit(0L)).as("heavy_rows"),
        count(lit(1)).as("heavy_keys"))
    counts
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        sum(col("c") * col("c")).as("exact_pairs"))
      .crossJoin(broadcast(heavy)) // single-row side; satisfies CartesianGuard
      .select(col("n_rows"), col("n_keys"), col("exact_pairs"),
        expr("n_rows * n_rows div n_keys").as("est_uniform"),
        expr("""heavy_pairs + (n_rows - heavy_rows) * (n_rows - heavy_rows)
                div nullif(n_keys - heavy_keys, 0L)""").as("est_hybrid"))
      .select(col("n_rows"), col("n_keys"), col("exact_pairs"),
        col("est_uniform"), col("est_hybrid"),
        expr("est_uniform * 1000L div exact_pairs").as("uniform_permille"),
        expr("est_hybrid * 1000L div exact_pairs").as("hybrid_permille"))
  }

  /** RETRIEVAL-QUALITY metrics for the embedding index — per query:
    * hit@k, first-relevant rank, floor-permille MRR and recall@k —
    * using label agreement as the relevance judgment (the standard
    * proxy when no human qrels exist; every same-label corpus vector is
    * "relevant"). This is the measurement that decides whether an ANN
    * configuration (s8/s13) is good enough to SERVE, not just whether
    * it matches a contract.
    *
    * Engine-exact: ranks are integers from the proven s3 ranking
    * (cosine rounded to 6 places, ties broken by vec_id), MRR is
    * `1000 div first_rel_rank`, recall is `1000·n_rel_at_k div
    * n_rel_total` — floor divisions only, no FP averages.
    *
    * Scale shape: the ranking is the one corpus scan [[Similarity.knnJoin]]
    * already makes (anchors broadcast, WindowGroupLimit bounds the
    * exchange); everything after operates on |queries|·k rows joined
    * against a |labels|-row count table — metadata scale. The
    * label-of-neighbor lookup joins the TINY top-k side as the build
    * side via broadcast, so the corpus is never reshuffled.
    */
  def retrievalEval(embeddings: DataFrame, queryIds: Seq[Long],
      k: Int = 20): DataFrame = {
    val topk = Similarity.knnJoin(embeddings, queryIds, k)
    val qLabels = embeddings.filter(col("vec_id").isin(queryIds.map(Long.box): _*))
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val labelTotals = embeddings.groupBy("label")
      .agg(count(lit(1)).as("n_label"))
    // neighbor label lookup: corpus-sized side stays put, top-k broadcasts
    val withLabels = embeddings
      .select(col("vec_id").as("n_vec_id"), col("label").as("n_label_val"))
      .join(broadcast(topk), col("n_vec_id") === col("vec_id"))
      .join(broadcast(qLabels), Seq("query_id"))
      .select(col("query_id"), col("q_label"), col("rank"),
        (col("n_label_val") === col("q_label")).as("is_rel"))
    withLabels
      .groupBy("query_id", "q_label")
      .agg(sum(when(col("is_rel"), 1L).otherwise(0L)).as("n_rel_at_k"),
        min(when(col("is_rel"), col("rank"))).as("first_rel_rank"),
        max(col("is_rel")).as("hit_at_k"))
      .join(broadcast(labelTotals), col("q_label") === col("label"))
      .select(col("query_id"), col("q_label"), col("n_rel_at_k"),
        col("first_rel_rank"), col("hit_at_k"),
        coalesce(expr("1000L div first_rel_rank"), lit(0L)).as("mrr_permille"),
        // self excluded from both the ranking and the relevant universe
        expr("n_rel_at_k * 1000L div nullif(n_label - 1L, 0L)")
          .as("recall_permille"))
      .orderBy("query_id")
  }

  /** GAIN/LIFT DECILE table per source — the campaign-targeting view of
    * the same score/label pair aucStats ranks ([[aucStats]] answers "is
    * the score any good overall"; this answers "if I can only act on the
    * top 10/20/...% of rows, what fraction of the positives do I
    * capture, and how much better than random is that" — the chart a
    * marketing or data-filtering decision is actually made from).
    *
    * Determinism: the decile assignment rides ntile(10) over the TOTAL
    * order (score DESC, doc_id) — both engines fill remainder rows into
    * the leading buckets under the same rule, so membership is exact.
    * capture = ⌊1000·cum_pos/tot_pos⌋ and lift =
    * ⌊1000·cum_pos·tot_rows/(cum_rows·tot_pos)⌋ — all non-negative
    * BIGINTs, so floor and truncate agree across engines; a source with
    * zero positives gets NULL (nullif), not a fake 0.
    *
    * Scale shape: ONE exchange on source — the ntile window, the
    * (source, decile) aggregate (clustering satisfied by the source
    * partitioning), the cumulative window, and the per-source totals all
    * ride it. Output ∝ sources × 10.
    */
  def liftDeciles(documents: DataFrame, buckets: Int = 10): DataFrame = {
    val rank = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
    val cum = Window.partitionBy("source").orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("source")
    documents
      .select(col("source"), col("doc_id"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
      .withColumn("decile", ntile(buckets).over(rank).cast("long"))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_rows"), sum(col("is_pos")).as("n_pos"))
      .withColumn("cum_rows", sum(col("n_rows")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .withColumn("tot_rows", sum(col("n_rows")).over(tot))
      .withColumn("tot_pos", sum(col("n_pos")).over(tot))
      .select(col("source"), col("decile"), col("n_rows"), col("n_pos"),
        expr("cum_pos * 1000L div nullif(tot_pos, 0L)").as("capture_permille"),
        expr("cum_pos * tot_rows * 1000L div nullif(cum_rows * tot_pos, 0L)")
          .as("lift_permille"))
      .orderBy("source", "decile")
  }
}
