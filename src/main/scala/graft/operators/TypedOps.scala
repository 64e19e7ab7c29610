package graft.operators

import org.apache.spark.sql.Dataset

/** Typed `Dataset[T]` surface: the same curation gate as
  * [[Dedup.curatedCorpus]], written against case classes instead of
  * columns — compile-time field/type checking for the per-document logic.
  *
  * Where typed helps: complex row-level predicates and per-group logic
  * get real Scala (pattern matching, helper functions, unit-testable
  * pure code) with schema mismatches caught at compile time instead of
  * at `AnalysisException` time.
  *
  * Where typed costs: lambdas are opaque to Catalyst — no predicate
  * pushdown through a `filter(d => ...)`, no codegen of the predicate
  * body, and `mapGroups` would shuffle whole rows with no partial
  * aggregation. The implementation keeps the costs bounded:
  * `reduceGroups` (a typed `ReduceAggregator`) DOES partially aggregate
  * map-side, so the dedup shuffle carries one candidate row per (key,
  * partition) — same shuffle shape as the untyped `groupBy(...).agg(min)`.
  * Equality with the untyped column pipeline is oracle-proven: the typed
  * query hash-matches the SAME DuckDB SQL as `d6_curated`.
  */
object TypedOps {

  /** Row types for the documents fixture and the curated output. */
  final case class Doc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)
  final case class CuratedDoc(doc_id: Long, n_tokens: Int)

  /** Plain-Scala mirrors of the column functions in
    * [[graft.functions.TextFunctions]]. Semantics must match EXACTLY —
    * the shared oracle is the referee:
    *  - `split(text, " ")` in Spark keeps trailing empty strings, so the
    *    Scala side must use `split(sep, -1)`, not `split(sep)`.
    *  - counts/ratios stay in integer arithmetic (cross-multiplied), the
    *    same determinism rule the column versions follow.
    */
  private[operators] def tokensOf(text: String): Array[String] =
    text.split(" ", -1)

  private[operators] def qualityScoreOf(text: String): Int = {
    val toks = tokensOf(text)
    // CODE POINTS, not String.length: Spark's length() and the oracle's
    // length() count code points, Java's counts UTF-16 units — they
    // diverge on astral-plane characters (emoji, rare CJK)
    val nChars = text.codePointCount(0, text.length)
    val nTok = toks.length
    val nStop = toks.count(graft.functions.TextFunctions.EnglishStopwords.contains)
    val lenOk = nChars >= 100 && nChars <= 5000
    val avgOk = (nChars - nTok + 1) >= nTok * 3 && (nChars - nTok + 1) <= nTok * 10
    val stopOk = nStop * 20 >= nTok
    val noLongTok = !toks.exists(t => t.codePointCount(0, t.length) > 25)
    Seq(lenOk, avgOk, stopOk, noLongTok).count(identity)
  }

  private[operators] def langIdOf(text: String): String = {
    val toks = tokensOf(text)
    val nStop = toks.count(graft.functions.TextFunctions.EnglishStopwords.contains)
    if (nStop * 20 >= toks.length) "en" else "unknown"
  }

  /** Typed curation gate: quality + language filter, exact dedup keeping
    * the min-doc_id representative, token count on the survivors.
    */
  def curatedCorpusTyped(documents: Dataset[Doc],
      minQuality: Int = 3): Dataset[CuratedDoc] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .filter(d => qualityScoreOf(d.text) >= minQuality && langIdOf(d.text) == "en")
      .groupByKey(_.text)
      // reduceGroups, NOT mapGroups: ReduceAggregator partially aggregates
      // map-side, so the shuffle carries one surviving row per (text,
      // partition) instead of every duplicate
      .reduceGroups((a, b) => if (a.doc_id <= b.doc_id) a else b)
      .map { case (_, d) => CuratedDoc(d.doc_id, tokensOf(d.text).length) }
      .sort("doc_id")
  }
}
