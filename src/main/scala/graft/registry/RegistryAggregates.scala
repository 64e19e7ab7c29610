package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, aggregate battery (a*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryAggregates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregates (A1-A3 + parity)
    "a1_multikey_summary" -> ((s, dir) => Aggregates.multiKeySummary(Tables.lineitem(s, dir))),
    "a2_single_key_stats" -> ((s, dir) => Aggregates.singleKeyStats(Tables.customer(s, dir))),
    "a3_count_all" -> ((s, dir) => Aggregates.countAll(Tables.lineitem(s, dir))),
    "a4_distinct_count" -> ((s, dir) => Aggregates.distinctCount(Tables.lineitem(s, dir))),
    "a5_rollup" -> ((s, dir) => Aggregates.rollupSummary(Tables.lineitem(s, dir))),
    // Arbitrary GROUPING SETS (the general form rollup/cube specialize),
    // verbatim through the SQL surface with GROUPING() disambiguation.
    "a11_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_sqlv")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
              |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
              |  COUNT(*) AS n,
              |  SUM(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
              |FROM lineitem_sqlv
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
              |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),
    // HLL sketch values aren't cross-engine comparable; the registered query
    // compares the 3·rsd accuracy CONTRACT instead (oracle emits TRUE).
    "a6_approx_distinct" -> ((s, dir) => Aggregates.approxDistinctChecked(Tables.lineitem(s, dir))),
    "a7_cube" -> ((s, dir) => Aggregates.cubeSummary(Tables.lineitem(s, dir))),
    "a8_percentiles" -> ((s, dir) => Aggregates.percentiles(Tables.lineitem(s, dir))),
    "a9_pivot" -> ((s, dir) => Aggregates.pivotSummary(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    "a10_collect" -> ((s, dir) => Aggregates.collectAggregates(Tables.lineitem(s, dir))),
    // GK-sketch accuracy contract (a6/d5b pattern): the approx median's
    // exact rank must sit within n/accuracy of n/2, checked integer-side.
    "a8b_approx_percentile" -> ((s, dir) => Aggregates.approxPercentileChecked(Tables.lineitem(s, dir))),
    // DataSketches HLL surface: estimate-accuracy + sketch-mergeability
    // booleans hash-compared against literal TRUE (d4c pattern).
    "a12_hll_contract" -> ((s, dir) => Aggregates.hllContract(Tables.events(s, dir))),
    // KMV bottom-k sketch: union + intersection estimates composed from
    // two groups' k-smallest-hash summaries with plain array ops — the
    // set-operation sketch HLL cannot express; bounds witnessed as
    // booleans next to SQL-exact overlap counts.
    "a17_kmv_contract" -> ((s, dir) => Aggregates.kmvContract(Tables.events(s, dir))),
    // Trailing-7-day distinct users via HLL sketch unions over a RANGE
    // frame — one reduce per day then metadata-scale merges, vs the
    // exact path's per-window key re-shuffle; 5% contract per day.
    "a18_sliding_hll" -> ((s, dir) => Aggregates.slidingDistinct(Tables.events(s, dir))),
    // Unpivot/melt: the inverse reshape of a9 (native Expand, row-local).
    "a14_unpivot" -> ((s, dir) =>
      Aggregates.unpivotSummary(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // Count-min sketch contract: never-under + eps bound + exact
    // shard-then-merge additivity, probed at the busiest user per type.
    "a13_cms_contract" -> ((s, dir) => Aggregates.cmsContract(Tables.events(s, dir))),
    // Exact weighted median (quantity-weighted price) per return flag:
    // corpus collapses to (group, cents) cells, partition-keyed running
    // sum, 2*cum >= total lower-median pick - all integer arithmetic.
    "a15_weighted_median" -> ((s, dir) => Aggregates.weightedMedian(Tables.lineitem(s, dir))),
    // DataFrameStatFunctions.crosstab surface on a 3-value column.
    "a25_crosstab" -> ((s, dir) =>
      Aggregates.crosstabPriorityStatus(Tables.orders(s, dir))),
    // count_if / bool_and / bool_or / struct-determinized argmax battery.
    "a26_bool_aggregates" -> ((s, dir) =>
      Aggregates.boolAggBattery(Tables.orders(s, dir))),
    // Biggest movers: part revenue rank deltas between two years —
    // integer ranks survive the hash gate where revenue ratios wouldn't.
    "a27_rank_movers" -> ((s, dir) =>
      Aggregates.rankMovers(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // Top-N customers per priority + an OTHER residual row — group
    // totals preserved, ranks deterministic.
    "a28_topn_other" -> ((s, dir) =>
      Aggregates.topNWithOther(Tables.orders(s, dir))),
    // Price-volume-mix bridge per brand with an explicit residual —
    // Δ = vol + price + residual holds to the cent by construction.
    "a29_price_volume_mix" -> ((s, dir) =>
      Aggregates.priceVolumeMix(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.part(s, dir))),
    // ABC Pareto classes: integer cumulative-share boundaries (≤800‰ A,
    // ≤950‰ B) with deterministic ranking ties.
    "a30_abc_classes" -> ((s, dir) =>
      Aggregates.abcClasses(Tables.lineitem(s, dir))),
    // Order-size mix vs GLOBAL discrete terciles — fixed band edges
    // reveal drift that per-year terciles would hide by construction.
    "a31_order_size_mix" -> ((s, dir) =>
      Aggregates.orderSizeMix(Tables.orders(s, dir))),
    // Deterministic mode (most-frequent, smallest on ties) — two hash
    // aggregates; the builtin mode() tie-break is partition-order noise.
    "a16_mode" -> ((s, dir) => Aggregates.modeOf(Tables.lineitem(s, dir))),
    // TPC-H Q6 shape: single-scan conditional aggregate, all three range
    // predicates scan-pushable; discount band in integer permille.
    "a19_q6_revenue" -> ((s, dir) =>
      Aggregates.q6ForecastRevenue(Tables.lineitem(s, dir))),
    // Two-measure pivot compiled to one conditional hash aggregate.
    "a20_pivot_multi" -> ((s, dir) =>
      Aggregates.pivotMultiAgg(Tables.orders(s, dir))),
    // Share-of-parent drill-down tree in floor basis points.
    "a21_share_tree" -> ((s, dir) =>
      Aggregates.shareTree(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    // Day-of-week profile by pure epoch arithmetic (no locale DOW).
    "a22_weekday_revenue" -> ((s, dir) =>
      Aggregates.weekdayRevenue(Tables.orders(s, dir))),
    // RFM quintile census: histogram-derived value edges + broadcast
    // banding (r10 — no global ntile window over the customer domain).
    "a23_rfm_cells" -> ((s, dir) => Aggregates.rfmCells(Tables.orders(s, dir))),
    // Order-size histogram: the profile basket mining is sized from.
    "a24_basket_hist" -> ((s, dir) =>
      Aggregates.basketHistogram(Tables.lineitem(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    // Display averages are rounded integer-side (q + [2·(s mod n) >= n] on
    // the scaled sum, half away from zero) — a scale-2 ROUND on a double
    // diverges cross-engine at .xx5 boundaries (Spark rounds the shortest
    // decimal repr HALF_UP, DuckDB rounds the binary value). min/max ride
    // integer cents for the same reason.
    "a1_multikey_summary" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_registros,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) / 100.0 AS revenue,
        | CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) // COUNT(*)
        |      + CASE WHEN (SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                   % COUNT(*)) * 2 >= COUNT(*) THEN 1 ELSE 0 END
        |      AS BIGINT) / 100.0 AS avg_price,
        | CAST(MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0 AS min_price,
        | CAST(MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0 AS max_price,
        | CAST(SUM(CAST(round(l_discount * 10000) AS BIGINT)) // COUNT(*)
        |      + CASE WHEN (SUM(CAST(round(l_discount * 10000) AS BIGINT))
        |                   % COUNT(*)) * 2 >= COUNT(*) THEN 1 ELSE 0 END
        |      AS BIGINT) / 10000.0 AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_single_key_stats" ->
      """WITH g AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
        |    MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS mn,
        |    MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS mx
        |  FROM customer GROUP BY c_mktsegment
        |)
        |SELECT c_mktsegment, n AS total_registros,
        | CAST((CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
        |      * (abs(s) // n
        |         + CASE WHEN (abs(s) % n) * 2 >= n THEN 1 ELSE 0 END)
        |      AS BIGINT) / 100.0 AS media_acctbal,
        | CAST(mn AS BIGINT) / 100.0 AS menor_acctbal,
        | CAST(mx AS BIGINT) / 100.0 AS maior_acctbal
        |FROM g ORDER BY c_mktsegment""".stripMargin,
    "a3_count_all" -> "SELECT COUNT(*) AS n FROM lineitem",
    "a4_distinct_count" ->
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "a5_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_registros,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        | CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a11_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a6_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact_parts,
        | TRUE AS approx_within_3rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a7_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_registros,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        | CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a8_percentiles" ->
      """SELECT l_returnflag,
        | ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | ROUND(median(l_extendedprice), 4) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a9_pivot" ->
      """SELECT o_orderpriority,
        | ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
        | ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
        | ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a10_collect" ->
      """SELECT l_returnflag,
        | array_to_string(list_sort(list(DISTINCT l_linestatus)), '|') AS statuses,
        | CAST(COUNT(l_orderkey) AS INT) AS n_values
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a8b_approx_percentile" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
        |       TRUE AS median_within_rank_error
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a12_hll_contract" ->
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS within_5pct, TRUE AS merge_within_5pct
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a17_kmv_contract" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events
        |           WHERE user_id IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |i AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
        |             CAST(COUNT(*) AS BIGINT) AS n_inter
        |      FROM d a JOIN d b ON a.user_id = b.user_id
        |                       AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT i.et_a, i.et_b,
        |       na.n + nb.n - i.n_inter AS n_union_exact,
        |       i.n_inter AS n_inter_exact,
        |       TRUE AS dist_a_within_20pct, TRUE AS dist_b_within_20pct,
        |       TRUE AS union_within_20pct, TRUE AS inter_within_quarter_union
        |FROM i JOIN n na ON na.event_type = i.et_a
        |       JOIN n nb ON nb.event_type = i.et_b
        |ORDER BY et_a, et_b""".stripMargin,
    "a18_sliding_hll" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT DISTINCT day AS g_day FROM d)
        |SELECT g.g_day AS day,
        |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_exact_7d,
        |       TRUE AS within_5pct
        |FROM g JOIN d ON d.day BETWEEN g.g_day - 6 AND g.g_day
        |GROUP BY g.g_day ORDER BY day""".stripMargin,
    "a14_unpivot" ->
      """SELECT o_orderpriority, l_returnflag,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a13_cms_contract" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
        |), top AS (
        |  SELECT event_type, cnt FROM c
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                             ORDER BY cnt DESC, user_id) = 1
        |)
        |SELECT event_type, CAST(cnt AS BIGINT) AS n_exact_top,
        |       TRUE AS never_under, TRUE AS within_eps,
        |       TRUE AS merge_consistent
        |FROM top ORDER BY event_type""".stripMargin,
    "a15_weighted_median" ->
      """WITH cells AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT *,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
        |  FROM cells
        |)
        |SELECT l_returnflag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
        |       CAST(MAX(total) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= total
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a25_crosstab" ->
      """SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a26_bool_aggregates" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS BIGINT)
        |    AS n_big,
        |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  (max({'cents': CAST(round(o_totalprice * 100) AS BIGINT),
        |        'k': o_orderkey})).k AS max_price_key,
        |  (min({'cents': CAST(round(o_totalprice * 100) AS BIGINT),
        |        'k': o_orderkey})).k AS min_price_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a27_rank_movers" ->
      """WITH rev AS (
        |  SELECT year(CAST(o.o_orderdate AS DATE)) AS yr, l.l_partkey,
        |    CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |             AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(CAST(o.o_orderdate AS DATE)) IN (1997, 1998)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT yr, l_partkey, cents,
        |    CAST(row_number() OVER (PARTITION BY yr
        |      ORDER BY cents DESC, l_partkey) AS BIGINT) AS rk
        |  FROM rev
        |)
        |SELECT a.l_partkey, a.rk AS rk_a, b.rk AS rk_b,
        |  a.rk - b.rk AS rank_delta,
        |  a.cents AS cents_a, b.cents AS cents_b
        |FROM r a JOIN r b ON a.l_partkey = b.l_partkey
        |WHERE a.yr = 1997 AND b.yr = 1998
        |ORDER BY abs(a.rk - b.rk) DESC, a.l_partkey
        |LIMIT 50""".stripMargin,
    "a28_topn_other" ->
      """WITH rev AS (
        |  SELECT o_orderpriority, o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY cents DESC, o_custkey) AS BIGINT) AS rk
        |  FROM rev
        |)
        |SELECT o_orderpriority, CAST(o_custkey AS VARCHAR) AS entity,
        |       cents, n_orders, rk
        |FROM r WHERE rk <= 3
        |UNION ALL
        |SELECT o_orderpriority, 'OTHER' AS entity,
        |       CAST(SUM(cents) AS BIGINT), CAST(SUM(n_orders) AS BIGINT),
        |       4 AS rk
        |FROM r WHERE rk > 3 GROUP BY 1
        |ORDER BY 1, 5""".stripMargin,
    "a29_price_volume_mix" ->
      """WITH base AS (
        |  SELECT year(CAST(o.o_orderdate AS DATE)) AS yr, p.p_brand,
        |    CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |             AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE year(CAST(o.o_orderdate AS DATE)) IN (1997, 1998)
        |  GROUP BY 1, 2
        |)
        |SELECT a.p_brand, a.qty AS q0, b.qty AS q1,
        |  a.cents AS c0, b.cents AS c1,
        |  (b.qty - a.qty) * (a.cents // a.qty) AS vol_eff,
        |  b.qty * (b.cents // b.qty - a.cents // a.qty) AS price_eff,
        |  b.cents - a.cents
        |    - (b.qty - a.qty) * (a.cents // a.qty)
        |    - b.qty * (b.cents // b.qty - a.cents // a.qty) AS residual
        |FROM base a JOIN base b ON a.p_brand = b.p_brand
        |WHERE a.yr = 1997 AND b.yr = 1998
        |ORDER BY a.p_brand""".stripMargin,
    "a30_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |             AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1
        |), c AS (
        |  SELECT cents,
        |    SUM(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cents) OVER () AS total
        |  FROM rev
        |), k AS (
        |  SELECT CASE WHEN cum * 1000 // total <= 800 THEN 'A'
        |              WHEN cum * 1000 // total <= 950 THEN 'B'
        |              ELSE 'C' END AS cls, cents
        |  FROM c
        |), g AS (
        |  SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |    CAST(SUM(cents) AS BIGINT) AS rev_cents
        |  FROM k GROUP BY 1
        |)
        |SELECT cls, n_parts, rev_cents,
        |  CAST(rev_cents * 1000 // (SUM(rev_cents) OVER ()) AS BIGINT)
        |    AS share_permille
        |FROM g ORDER BY cls""".stripMargin,
    "a31_order_size_mix" ->
      """WITH vals AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        |), cum AS (
        |  SELECT cents, SUM(cnt) OVER (ORDER BY cents) AS cum,
        |         SUM(cnt) OVER () AS n
        |  FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM vals GROUP BY 1)
        |), b AS (
        |  SELECT
        |    MIN(CASE WHEN cum >= (n - 1) * 33 // 100 + 1 THEN cents END)
        |      AS p33,
        |    MIN(CASE WHEN cum >= (n - 1) * 67 // 100 + 1 THEN cents END)
        |      AS p67
        |  FROM cum
        |), g AS (
        |  SELECT yr,
        |    CASE WHEN cents <= p33 THEN 'small'
        |         WHEN cents <= p67 THEN 'mid' ELSE 'large' END AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM vals CROSS JOIN b
        |  GROUP BY 1, 2
        |)
        |SELECT yr, band, n_orders,
        |  CAST(n_orders * 1000 // (SUM(n_orders) OVER (PARTITION BY yr))
        |       AS BIGINT) AS share_permille
        |FROM g ORDER BY yr, band""".stripMargin,
    "a16_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT l_returnflag, q, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, q ASC) AS rn
        |  FROM c
        |)
        |SELECT l_returnflag, q AS mode_quantity, CAST(cnt AS BIGINT) AS n_mode
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "a19_q6_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE EXTRACT(year FROM l_shipdate) = 1997
        |  AND CAST(round(l_discount * 1000) AS BIGINT) BETWEEN 50 AND 70
        |  AND CAST(round(l_quantity) AS BIGINT) < 24""".stripMargin,
    "a20_pivot_multi" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
        |    AS f_cents,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
        |    AS o_cents,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
        |    AS p_cents,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a21_share_tree" ->
      """WITH pn AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS nation_cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2
        |), w AS (
        |  SELECT region, nation, nation_cents,
        |    CAST(SUM(nation_cents) OVER (PARTITION BY region) AS BIGINT)
        |      AS region_cents,
        |    CAST(SUM(nation_cents) OVER () AS BIGINT) AS total_cents
        |  FROM pn
        |)
        |SELECT region, nation, nation_cents, region_cents,
        |  CAST(nation_cents * 10000 // region_cents AS BIGINT)
        |    AS nation_share_bp,
        |  CAST(region_cents * 10000 // total_cents AS BIGINT)
        |    AS region_share_bp
        |FROM w ORDER BY region, nation""".stripMargin,
    "a22_weekday_revenue" ->
      """WITH d AS (
        |  SELECT ((CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 4) % 7
        |           AS dow,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |), g AS (
        |  SELECT CAST(dow AS BIGINT) AS dow,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM d GROUP BY 1
        |), t AS (
        |  SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
        |         CAST(SUM(n_orders) AS BIGINT) AS total_orders
        |  FROM g
        |)
        |SELECT dow, n_orders, cents,
        |  CAST(cents * 10000 // total_cents AS BIGINT) AS revenue_share_bp,
        |  CAST(n_orders * 10000 // total_orders AS BIGINT) AS order_share_bp
        |FROM g, t ORDER BY dow""".stripMargin,
    // r10: quintile VALUE edges (order statistic at rank (n-1)*p//100 + 1,
    // p = 20/40/60/80) + banding — replaces the r9 global-ntile form whose
    // three partition-less windows were a single-reducer sort over the
    // customer domain. Ties now always share a score.
    "a23_rfm_cells" ->
      """WITH pc AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |         CAST(COUNT(*) AS BIGINT) AS freq,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS monetary
        |  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1
        |), t AS (SELECT MAX(last_d) AS ref_d, CAST(COUNT(*) AS BIGINT) AS n
        |         FROM pc),
        |s AS (
        |  SELECT o_custkey, CAST(ref_d - last_d AS BIGINT) AS recency_days,
        |         freq, monetary
        |  FROM pc, t
        |), rcc AS (
        |  SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum
        |  FROM (SELECT recency_days AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM s GROUP BY 1)
        |), re AS (
        |  SELECT MIN(CASE WHEN cum >= (n-1)*20//100 + 1 THEN v END) AS re1,
        |         MIN(CASE WHEN cum >= (n-1)*40//100 + 1 THEN v END) AS re2,
        |         MIN(CASE WHEN cum >= (n-1)*60//100 + 1 THEN v END) AS re3,
        |         MIN(CASE WHEN cum >= (n-1)*80//100 + 1 THEN v END) AS re4
        |  FROM rcc, t
        |), fcc AS (
        |  SELECT v, SUM(cnt) OVER (ORDER BY v DESC) AS cum
        |  FROM (SELECT freq AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM s GROUP BY 1)
        |), fe AS (
        |  SELECT MAX(CASE WHEN cum >= (n-1)*20//100 + 1 THEN v END) AS fe1,
        |         MAX(CASE WHEN cum >= (n-1)*40//100 + 1 THEN v END) AS fe2,
        |         MAX(CASE WHEN cum >= (n-1)*60//100 + 1 THEN v END) AS fe3,
        |         MAX(CASE WHEN cum >= (n-1)*80//100 + 1 THEN v END) AS fe4
        |  FROM fcc, t
        |), mcc AS (
        |  SELECT v, SUM(cnt) OVER (ORDER BY v DESC) AS cum
        |  FROM (SELECT monetary AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM s GROUP BY 1)
        |), me AS (
        |  SELECT MAX(CASE WHEN cum >= (n-1)*20//100 + 1 THEN v END) AS me1,
        |         MAX(CASE WHEN cum >= (n-1)*40//100 + 1 THEN v END) AS me2,
        |         MAX(CASE WHEN cum >= (n-1)*60//100 + 1 THEN v END) AS me3,
        |         MAX(CASE WHEN cum >= (n-1)*80//100 + 1 THEN v END) AS me4
        |  FROM mcc, t
        |), sc AS (
        |  SELECT monetary, recency_days, freq,
        |    1 + (CASE WHEN recency_days > re1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency_days > re2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency_days > re3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency_days > re4 THEN 1 ELSE 0 END) AS r_score,
        |    1 + (CASE WHEN freq < fe1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq < fe2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq < fe3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq < fe4 THEN 1 ELSE 0 END) AS f_score,
        |    1 + (CASE WHEN monetary < me1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary < me2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary < me3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary < me4 THEN 1 ELSE 0 END) AS m_score
        |  FROM s, re, fe, me
        |)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |       CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score,
        |       CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(monetary) AS BIGINT) AS cell_cents,
        |       CAST(SUM(recency_days) // COUNT(*) AS BIGINT) AS avg_recency_days,
        |       CAST(SUM(freq) // COUNT(*) AS BIGINT) AS avg_orders
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "a24_basket_hist" ->
      """WITH po AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |  FROM lineitem GROUP BY 1
        |), h AS (
        |  SELECT n_lines, n_parts, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM po GROUP BY 1, 2
        |), t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total_orders FROM h)
        |SELECT n_lines, n_parts, n_orders,
        |       CAST(n_orders * 10000 // total_orders AS BIGINT) AS share_bp
        |FROM h, t ORDER BY n_lines, n_parts""".stripMargin,
  )
}
