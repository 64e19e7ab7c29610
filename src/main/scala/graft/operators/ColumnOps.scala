package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested-type scalar surface (§2.8 parity): build a map and a struct
  * from flat columns, then extract/inspect them — the round trip a user
  * hits when shaping semi-structured output. All outputs are scalar, so
  * the oracle can verify the VALUES directly while the Spark side is the
  * one exercising map/struct construction and field access.
  */
object NestedOps {

  def mapStructFuncs(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"),
        map(lit("priority"), col("o_orderpriority"),
          lit("status"), col("o_orderstatus")).as("m"),
        struct(col("o_orderpriority").as("priority"),
          col("o_totalprice").as("total")).as("s"))
      .select(col("o_orderkey"),
        col("m")(lit("priority")).as("priority"),
        col("m")(lit("status")).as("status"),
        size(col("m")).as("n_entries"),
        concat_ws("|", array_sort(map_keys(col("m")))).as("keys_sorted"),
        array_contains(map_values(col("m")), "O").as("has_open_value"),
        col("s").getField("priority").as("s_priority"),
        round(col("s").getField("total"), 2).as("s_total"))
      .orderBy("o_orderkey")
}

/** Projection / filter / column-op inventory (SURVEY.md §2.2, P1-P9).
  *
  * Reference semantics from `/root/reference/src/glue/b3_collector.py`
  * (normalize at :78, guarded rename at :88-95, dataproc at :106-107) and
  * `/root/reference/src/glue/b3_transform.py` (null filter at :115-136,
  * date prep at :41-46, renames at :62-64, projection at :294-297).
  *
  * All are narrow transformations — no shuffle, fully codegen'd, and the
  * projections/filters sit directly over the scan so Catalyst pushes them
  * into parquet (column pruning + row-group predicate pushdown). At 100 TB
  * these run at scan speed.
  */
object ColumnOps {

  /** P1: literal column add (`b3_collector.py:48` — `df['Ticker'] = t`). */
  def litAdd(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("source", lit("B3"))
      .withColumn("dataproc", lit("20240101"))
      .orderBy("o_orderkey")

  /** P2: bulk column rename — the reference lowercases and hyphenates all
    * names in one shot (`b3_collector.py:78`); same one-shot `toDF` here,
    * stripping the TPC-H `l_` prefix.
    */
  def bulkRename(lineitem: DataFrame): DataFrame = {
    val renamed = lineitem.toDF(lineitem.columns.map(_.stripPrefix("l_")).toIndexedSeq: _*)
    // Order by the verified-unique tuple BEFORE projecting (fixture
    // lineitem duplicates (orderkey, linenumber)); projection preserves
    // row order, so the emitted stream is total-ordered for the oracle.
    renamed
      .orderBy("orderkey", "linenumber", "quantity", "partkey", "suppkey", "extendedprice")
      .select("orderkey", "linenumber", "quantity", "returnflag")
  }

  /** P3: guarded fallback rename (`b3_collector.py:88-95`) — rename the
    * first matching candidate to `date` only if `date` is missing.
    * Delegates to the single shared implementation in
    * [[graft.sources.Ingest.ensureDateColumn]].
    */
  def guardedRename(orders: DataFrame): DataFrame =
    graft.sources.Ingest
      .ensureDateColumn(orders, candidates = Seq("o_orderdate", "datetime", "timestamp"))
      .select("o_orderkey", "date")
      .orderBy("o_orderkey")

  /** P4: processing-date string column (`b3_collector.py:106-107` uses
    * `now().strftime("%Y%m%d")`; a fixed source column keeps the oracle
    * deterministic — the formatting op is the semantics under test).
    */
  def dataprocColumn(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("dataproc"))
      .orderBy("o_orderkey")

  /** P5: null-filter conjunction (`b3_transform.py:122-126`) — reference
    * chains four filters; declared as one conjunction (Catalyst collapses
    * either form to a single predicate pushed to parquet).
    */
  def nullFilter(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity").isNotNull && col("l_shipdate").isNotNull &&
        col("l_returnflag").isNotNull && col("l_orderkey").isNotNull)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_partkey",
        "l_suppkey", "l_extendedprice")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  /** P6+P7: cast→date and date-part extraction (`b3_transform.py:41-46`). */
  def dateParts(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("date"),
        year(to_date(col("o_orderdate"))).as("year"),
        month(to_date(col("o_orderdate"))).as("month"))
      .orderBy("o_orderkey")

  /** P8: targeted renames (`b3_transform.py:62-64`). */
  def targetedRenames(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumnRenamed("l_extendedprice", "preco_fechamento")
      .withColumnRenamed("l_quantity", "volume_negociado")
      .orderBy("l_orderkey", "l_linenumber", "volume_negociado", "l_partkey",
        "l_suppkey", "preco_fechamento")
      .select("l_orderkey", "l_linenumber", "preco_fechamento", "volume_negociado")

  /** P9: column projection (`b3_transform.py:294-297`). */
  def projection(part: DataFrame): DataFrame =
    part.select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .orderBy("p_partkey")

  /** String-function battery (§2.8 parity: the reference's driver-side
    * `.lower()`/`.replace()`/f-strings as column ops).
    */
  def stringFuncs(part: DataFrame): DataFrame =
    part.select(col("p_partkey"),
      lower(col("p_name")).as("lower_name"),
      upper(col("p_brand")).as("upper_brand"),
      regexp_replace(col("p_name"), " ", "-").as("hyphen_name"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      substring(col("p_name"), 1, 5).as("name5"),
      length(col("p_name")).as("name_len"),
      trim(col("p_name")).as("trimmed"))
      .orderBy("p_partkey")

  /** Null-handling battery: nullif → na.fill / coalesce / isnull flags
    * (the df.na surface; fixtures are null-free so nulls are introduced
    * deterministically with nullif).
    */
  def nullHandling(lineitem: DataFrame): DataFrame = {
    val withNulls = lineitem
      .withColumn("rf_nullable",
        when(col("l_returnflag") === "A", lit(null: String))
          .otherwise(col("l_returnflag")))
    withNulls
      .na.fill(Map("rf_nullable" -> "FILLED"))
      .withColumn("rf_coalesced",
        coalesce(when(col("l_returnflag") === "A", lit(null: String)),
          lit("C")))
      .withColumn("was_null",
        when(col("l_returnflag") === "A", lit(null: String)).isNull.cast("int"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_partkey",
        "l_suppkey", "l_extendedprice")
      .select("l_orderkey", "l_linenumber", "rf_nullable", "rf_coalesced", "was_null")
  }

  /** Date-function battery (§2.8 parity around the `dataproc`/`to_date`
    * family).
    */
  def dateFuncs(orders: DataFrame): DataFrame = {
    val d = to_date(col("o_orderdate"))
    orders.select(col("o_orderkey"),
      d.as("date"),
      date_add(d, 30).as("plus_30d"),
      add_months(d, 1).as("plus_1m"),
      last_day(d).as("month_end"),
      trunc(d, "month").as("month_start"),
      datediff(lit(java.sql.Date.valueOf("2026-01-01")), d).as("days_to_2026"),
      dayofweek(d).as("dow"),
      quarter(d).as("q"))
      .orderBy("o_orderkey")
  }

  /** Higher-order-function battery (p14): the lambda surface over array
    * columns — filter / exists / forall / aggregate(fold) / indexed
    * transform — all codegen-adjacent builtins, zero UDFs, row-local.
    * The indexed transform uses Spark's 0-based lambda index shifted to
    * 1-based so the arithmetic is engine-portable (DuckDB's `(x, i)`
    * lambdas index from 1). Token array projected once ([[graft.functions
    * .TextFunctions.shinglesKTokens]] multi-reference discipline).
    */
  def hofBattery(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(filter(col("toks"), t => length(t) > 5)).cast("long").as("n_long"),
        exists(col("toks"), t => t.rlike("^[A-Z]")).as("has_capitalized"),
        forall(col("toks"), t => length(t) < 25).as("all_short"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .as("total_chars"),
        aggregate(
          zip_with(col("toks"),
            sequence(lit(1), greatest(size(col("toks")), lit(1))),
            (t, i) => length(t).cast("long") * i),
          lit(0L), (acc, x) => acc + x).as("pos_weighted_chars"))
      .orderBy("doc_id")

  /** BITWISE battery — the aggregate bit algebra (`bit_and`/`bit_or`/
    * `bit_xor`) plus per-value popcount, grouped per priority class.
    * These are the primitives behind bitmap-style presence masks,
    * xor-fold checksums ([[graft.sources.Sinks]]'s manifest uses the
    * same fold), and feature-flag columns; the battery pins their
    * cross-engine semantics on BIGINT keys (all three aggregates are
    * order-independent, so no determinism hazard under partitioning).
    * All map-side-combining hash aggregates, state ∝ groups.
    */
  def bitwiseBattery(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey").isNotNull)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("bit_and(o_orderkey)").as("band"),
        expr("bit_or(o_orderkey)").as("bor"),
        expr("bit_xor(o_orderkey)").as("bxor"),
        sum(bit_count(col("o_orderkey")).cast("long")).as("sum_popcount"),
        max(bit_count(col("o_orderkey")).cast("long")).as("max_popcount"))
      .orderBy("o_orderpriority")

  /** `try_*` ERROR-SAFETY battery — pins the null-on-failure semantics
    * this codebase depends on under ANSI mode, where the unguarded
    * forms THROW (division by zero killed an early draft of the
    * blocking-eval metrics; this battery is the regression net for the
    * whole family):
    *
    *  - `try_cast(malformed AS INT/DATE)` → NULL, never an error — the
    *    quarantine primitive of every ingest path ([[graft.sources
    *    .Ingest]] isolates bad records with exactly this shape);
    *  - `try_divide` → NULL on zero divisor; its DOUBLE result is cast
    *    through `floor` while the numerators sit well inside 2⁵³, so
    *    the value is engine-exact despite the float intermediate.
    *
    * Synthetic malformation is keyed on o_orderkey residues, so both
    * engines poison the identical rows. One map-side-combining
    * aggregate, state ∝ priority classes.
    */
  def tryBattery(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("o_orderpriority"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
          .as("prio_digit"),
        expr("""try_cast(CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
               |         ELSE cast(o_orderdate AS STRING) END AS DATE)"""
          .stripMargin).as("maybe_date"),
        expr("""floor(try_divide(cast(round(o_totalprice * 100) AS BIGINT),
               |      o_orderkey % 3))""".stripMargin).as("div_floor"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("prio_digit").cast("long")).as("sum_digit"),
        sum(col("maybe_date").isNull.cast("long")).as("n_bad_dates"),
        sum(col("div_floor").isNull.cast("long")).as("n_div_null"),
        sum(col("div_floor").cast("long")).as("sum_div_floor"))
      .orderBy("o_orderpriority")
}
