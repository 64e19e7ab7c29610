package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship transform (E3), re-expressed Spark-first.
  *
  * Reference semantics: `/root/reference/src/glue/b3_transform.py:41-112`
  * (prepare at 41-46, renames at 62-64, window lag at 69-81, summary agg at
  * 88-112, null filter at 115-136). The fixture analog maps
  * `user_id`→ticker, `ts`→date, `value`→close, `event_id`→volume
  * (see FIXTURES.md role mapping).
  *
  * Scale notes (100 TB):
  *  - The whole pipeline is one narrow chain + exactly two wide
  *    dependencies: the window shuffle (hash by `user_id`) and the final
  *    aggregate shuffle. The `isNotNull` filters sit directly over the scan
  *    so Catalyst pushes them into the parquet reader (row-group pruning).
  *  - Both `lag` columns share ONE WindowSpec, so the plan has a single
  *    WindowExec (one exchange + one sort), not two.
  *  - The aggregation is a hash aggregate with map-side partial
  *    aggregation; grouping keys (user, year, month) are low-cardinality
  *    relative to input, so the shuffle after the partial agg is tiny.
  *  - No eager actions: the reference's 7× count()/show() re-executions
  *    (`b3_transform.py:242-352`) are deliberately NOT replicated.
  */
object B3Pipeline {

  /** Null-filter conjunction (P5) — reference chains four `.filter()` calls
    * (`b3_transform.py:122-126`); Catalyst collapses them to one predicate,
    * we declare the conjunction directly.
    */
  def filterNulls(events: DataFrame): DataFrame =
    events.filter(
      col("value").isNotNull && col("event_id").isNotNull &&
        col("user_id").isNotNull && col("ts").isNotNull)

  /** P6/P7/P8: cast→date, date-part extraction, targeted renames
    * (`b3_transform.py:41-64`). `event_id` doubles as the unique
    * within-partition ordering key (the fixture's trading-period index).
    */
  def prepare(events: DataFrame): DataFrame =
    filterNulls(events)
      .withColumn("date", to_date(col("ts")))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumnRenamed("value", "preco_fechamento")
      .withColumn("volume_negociado", col("event_id"))

  /** Exact half-away-from-zero integer rounding of n/d (d > 0), for
    * operands small enough that double division is exact (< 2^53): this is
    * `round(n/d)` computed identically by ANY engine — no binary-double
    * vs decimal-string rounding divergence (Spark rounds the shortest
    * string of a double, other engines round its binary value; exact .5
    * cases go opposite ways).
    */
  private def divHalfAway(n: Column, d: Column): Column =
    when(n >= 0, floor((n * 2 + d) / (d * 2)))
      .otherwise(-floor(((-n) * 2 + d) / (d * 2)))
      .cast("long")

  /** W1-W3: lag 7/30 over a single window spec + conditional % variation
    * (`b3_transform.py:69-81`; formula documented at `:362`).
    * Window is ordered by the unique `event_id` (row-based periods, not
    * calendar days — matches the reference's row-offset `lag`).
    *
    * The % variation `round((cur-prev)/prev*100, 2)` is computed in exact
    * integer arithmetic (prices are 2-decimal → cents are integers;
    * variation in basis points via [[divHalfAway]]) and only converted to
    * double at the end — engine-independent down to the bit. A zero/absent
    * base price yields NULL (under Spark 4's default ANSI mode a bare x/0
    * would ERROR; pre-ANSI Spark returned NULL).
    */
  def withVariations(prepared: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val cents = round(col("preco_fechamento") * 100).cast("long")
    // Materialize each lag ONCE as a column before branching on it: a
    // window expression referenced several times inside when/otherwise
    // branches gets extracted into that many duplicate WindowExec slots
    // (and here, split across two Window nodes) by Catalyst.
    def variationQ(prevCents: Column): Column =
      when(prevCents.isNotNull && prevCents > 0,
        divHalfAway((cents - prevCents) * 10000, prevCents))
        .otherwise(lit(null))
    prepared
      // one select emitting all four lags → ONE WindowExec (chained
      // withColumns left Catalyst with two un-merged Window nodes)
      .select(col("*"),
        lag(col("preco_fechamento"), 7).over(w).as("preco_7d_atras"),
        lag(col("preco_fechamento"), 30).over(w).as("preco_30d_atras"),
        lag(cents, 7).over(w).as("_c7"),
        lag(cents, 30).over(w).as("_c30"))
      .withColumn("variacao_7d_q", variationQ(col("_c7")))
      .withColumn("variacao_30d_q", variationQ(col("_c30")))
      .withColumn("variacao_7d", col("variacao_7d_q") / 100.0)
      .withColumn("variacao_30d", col("variacao_30d_q") / 100.0)
      .drop("_c7", "_c30")
  }

  /** round(avg(x), 2) over 2-decimal data, exactly: scaled-integer sum →
    * [[divHalfAway]] → /100. NULL when no rows (avg semantics).
    */
  private def exactRoundedAvg(scaled: Column): Column = {
    val n = count(scaled)
    when(n > 0, divHalfAway(sum(scaled), n).cast("double") / 100.0)
      .otherwise(lit(null))
  }

  /** A1+O1: multi-key group-by summary with 7 aggregates + total sort
    * (`b3_transform.py:88-112`, orderBy at `:106`). Rounded averages use
    * exact scaled-integer arithmetic (see [[withVariations]]); min/max of
    * 2-decimal data round to themselves, so plain `round` is exact there.
    */
  def summary(withVars: DataFrame): DataFrame =
    withVars
      .withColumn("preco_cents", round(col("preco_fechamento") * 100).cast("long"))
      .groupBy("user_id", "year", "month")
      .agg(
        count(lit(1)).as("total_registros"),
        sum("volume_negociado").as("volume_total"),
        exactRoundedAvg(col("preco_cents")).as("media_preco"),
        round(min("preco_fechamento"), 2).as("menor_preco"),
        round(max("preco_fechamento"), 2).as("maior_preco"),
        exactRoundedAvg(col("variacao_7d_q")).as("media_variacao_7d"),
        exactRoundedAvg(col("variacao_30d_q")).as("media_variacao_30d"))
      .orderBy("user_id", "year", "month")

  /** A2+O2: single-key stats group-by (`b3_transform.py:336-344`). */
  def stats(withVars: DataFrame): DataFrame =
    withVars
      .withColumn("preco_cents", round(col("preco_fechamento") * 100).cast("long"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("total_registros"),
        exactRoundedAvg(col("preco_cents")).as("media_preco"),
        exactRoundedAvg(col("variacao_7d_q")).as("media_variacao_7d"),
        exactRoundedAvg(col("variacao_30d_q")).as("media_variacao_30d"))
      .orderBy("user_id")

  /** Full flagship: scan → filter → prepare → window → summary. */
  def flagship(events: DataFrame): DataFrame =
    summary(withVariations(prepare(events)))

  /** The pre-aggregation frame (P9 projection of the refined schema),
    * totally ordered for oracle comparison.
    */
  def variationsFrame(events: DataFrame): DataFrame =
    withVariations(prepare(events))
      .select("event_id", "user_id", "date", "year", "month",
        "preco_fechamento", "volume_negociado",
        "preco_7d_atras", "preco_30d_atras", "variacao_7d", "variacao_30d")
      .orderBy("event_id")
}
