package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, join shapes incl. the TPC-H set (j*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryJoins {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Joins (parity surface, §2.7)
    "j1_broadcast_dim" -> ((s, dir) => JoinOps.broadcastDim(Tables.nation(s, dir), Tables.region(s, dir))),
    "j2_fact_join" -> ((s, dir) => JoinOps.factJoin(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    "j3_left_outer" -> ((s, dir) => JoinOps.leftOuter(Tables.customer(s, dir), Tables.orders(s, dir))),
    "j4_semi_join" -> ((s, dir) => JoinOps.semiJoin(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "j5_anti_join" -> ((s, dir) => JoinOps.antiJoin(Tables.customer(s, dir), Tables.orders(s, dir))),
    // TPC-H Q5 shape: six tables, the supplier edge closes a join CYCLE
    // (customer and supplier constrained to the same nation).
    "j10_local_supplier" -> ((s, dir) => JoinOps.localSupplierRevenue(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    // Skew-salted fact-dim join; oracle is the PLAIN join — the hash gate
    // proves the salt is semantics-preserving.
    "j11_salted_join" -> ((s, dir) => JoinOps.saltedSupplierRevenue(
      Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "j6_star_join" -> ((s, dir) => JoinOps.starJoin(Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    // TPC-H Q8 shape: per-year revenue share of one nation's suppliers
    // as an integer permille (sum(when) rides the same partial agg; the
    // share is floor division — no cross-engine FP anywhere).
    "j17_market_share" -> ((s, dir) => JoinOps.marketShare(
      Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.supplier(s, dir), Tables.nation(s, dir))),
    "j7_range_join" -> ((s, dir) => JoinOps.rangeJoin(Tables.events(s, dir))),
    // Fact-fact proximity join by interval binning: equi-join on
    // (user, time bucket) with 3-bucket neighbor probing - no cross
    // product, each pair surfaces exactly once.
    "j12_proximity_join" -> ((s, dir) => JoinOps.proximityJoin(Tables.events(s, dir))),
    "j8_top_revenue" -> ((s, dir) => JoinOps.topRevenueOrders(Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir), "BUILDING", 10)),
    "j9_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      import org.apache.spark.sql.functions.col
      JoinOps.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("event_id").as("click_event_id"), col("value").as("click_value")),
        key = "user_id", time = "event_id",
        rightCols = Seq("click_event_id", "click_value"), outPrefix = "")
        .orderBy("event_id")
    }),
    // Forward as-of: each purchase joined to the user's NEXT click at-or-
    // after it (merge_asof direction='forward' parity; same merged-stream
    // carry as j9, scan order reversed).
    // Tolerance-bounded as-of (merge_asof tolerance parity): matches
    // further than 500 event-id units revert to no-match.
    "j15_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      import org.apache.spark.sql.functions.col
      JoinOps.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"),
            col("event_id").as("click_event_id"),
            col("value").as("click_value")),
        key = "user_id", time = "event_id",
        rightCols = Seq("click_event_id", "click_value"), outPrefix = "",
        tolerance = Some(500L))
        .orderBy("event_id")
    }),
    // The NATIVE as-of operator (custom LogicalPlan+Strategy+SparkPlan)
    // on the same inputs as j9 - the custom physical operator itself is
    // oracle-verified against DuckDB's ASOF JOIN.
    "j14_asof_native" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      import org.apache.spark.sql.functions.col
      graft.plans.AsOfJoinNative.join(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"),
            col("event_id").as("click_event_id"),
            col("value").as("click_value")),
        key = "user_id", time = "event_id",
        rightCols = Seq("click_event_id", "click_value"), outPrefix = "")
        .orderBy("event_id")
    }),
    "j13_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      import org.apache.spark.sql.functions.col
      JoinOps.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"),
            col("event_id").as("click_event_id"),
            col("value").as("click_value")),
        key = "user_id", time = "event_id",
        rightCols = Seq("click_event_id", "click_value"), outPrefix = "",
        direction = "forward")
        .orderBy("event_id")
    }),
    // Blocked entity resolution on part names: canonicalize to DISTINCT
    // names first (work/output bounded by the name domain, not rows),
    // then rarest-token block key + Levenshtein <= 3 inside the equi
    // join condition - subquadratic record linkage, no cartesian.
    "j16_blocked_er" -> ((s, dir) => EntityResolution.blockedNamePairs(Tables.part(s, dir))),
    // Null-safe full-outer cohort join: NULL is a matchable key (the
    // unattributed bucket), pre-aggregated per side so the null key
    // carries one row, not a skew block.
    "j36_nullsafe_join" -> ((s, dir) =>
      JoinOps.nullSafeCohortJoin(Tables.events(s, dir))),
    // ER classify step: integer Fellegi-Sunter-style field-agreement
    // scores over rarest-token-blocked name pairs.
    "j37_er_scoring" -> ((s, dir) =>
      EntityResolution.erMatchScores(Tables.part(s, dir))),
    // NOT IN vs NOT EXISTS null-semantics pin: a NULL in the subquery
    // list empties NOT IN (three-valued logic) but not NOT EXISTS —
    // evaluated by Spark's OWN subquery planner via the SQL front door,
    // so a planner regression (not just an operator bug) flips the row.
    "j38_subquery_null_battery" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_nullv")
      Tables.customer(s, dir).createOrReplaceTempView("customer_nullv")
      s.sql("""SELECT
              |  (SELECT COUNT(*) FROM customer_nullv WHERE c_custkey IN
              |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
              |            ELSE o_custkey END FROM orders_nullv
              |     WHERE o_totalprice > 200000)) AS n_in,
              |  (SELECT COUNT(*) FROM customer_nullv WHERE c_custkey NOT IN
              |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
              |            ELSE o_custkey END FROM orders_nullv
              |     WHERE o_totalprice > 200000)) AS n_not_in,
              |  (SELECT COUNT(*) FROM customer_nullv c WHERE NOT EXISTS
              |    (SELECT 1 FROM orders_nullv o
              |     WHERE o.o_custkey = c.c_custkey
              |       AND o.o_totalprice > 200000)) AS n_not_exists,
              |  (SELECT COUNT(*) FROM customer_nullv WHERE c_custkey NOT IN
              |    (SELECT o_custkey FROM orders_nullv
              |     WHERE o_custkey IS NOT NULL
              |       AND o_totalprice > 200000)) AS n_not_in_nullfree
              |""".stripMargin)
    }),
    // TPC-H Q18 shape: HAVING-filtered fact pre-aggregation joined back
    // to orders + broadcast customer, top-k by cents.
    "j18_q18_bigspenders" -> ((s, dir) =>
      JoinOps.q18BigSpenders(Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // TPC-H Q17 shape: correlated per-part average decorrelated into one
    // broadcast aggregate; cross-multiplied integer threshold.
    "j19_q17_smallqty" -> ((s, dir) =>
      JoinOps.q17SmallQtyRevenue(Tables.lineitem(s, dir), Tables.part(s, dir))),
    // TPC-H Q21 shape: EXISTS + NOT-EXISTS over the fact table rewritten
    // as one per-order aggregate (no l2/l3 self-joins).
    "j20_q21_waiting" -> ((s, dir) =>
      JoinOps.q21WaitingSuppliers(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.supplier(s, dir))),
    // TPC-H Q15 shape: revenue view reused for max + probe; all ties.
    "j21_q15_topsupplier" -> ((s, dir) =>
      JoinOps.q15TopSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    // TPC-H Q22 shape: scalar-average subquery (cross-multiplied to
    // integer cents) + anti-join against orders.
    "j22_q22_opportunity" -> ((s, dir) =>
      JoinOps.q22SalesOpportunity(Tables.customer(s, dir), Tables.orders(s, dir))),
    // The NATIVE interval-overlap operator (the second custom
    // LogicalPlan+Strategy+SparkPlan) on j12's proximity semantics:
    // error windows × click points per user via the plane sweep; the
    // oracle is the independently-written naive non-equi SQL, so the
    // hash gate verifies the physical operator itself.
    "j23_interval_native" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, dir)
      val W = 300000000L
      val base = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val errors = base.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          (col("us") - W).as("w_start"), (col("us") + W).as("w_end"))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"))
      // outer = true keeps zero-hit errors in ONE pass — no join-back;
      // count(iv_us) ignores the null-padded unmatched rows
      val pairs = graft.plans.IntervalJoinNative.join(errors, clicks,
        key = "user_id", lStart = "w_start", lEnd = "w_end",
        rStart = "us", rEnd = "us", rightCols = Seq("us"), outer = true)
      pairs.groupBy("event_id", "user_id")
        .agg(count(col("iv_us")).as("n_near_clicks"))
        .orderBy("event_id")
    }),
    // TPC-H Q4 shape: quarter of orders, EXISTS late-shipped line as a
    // LEFT SEMI with a non-equi term, counts by priority class.
    "j24_q4_priority" -> ((s, dir) =>
      JoinOps.q4OrderPriority(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q7 shape: bilateral nation trade, nation dim joined twice in
    // two roles (both broadcast, pre-filtered to the pair).
    "j25_q7_volume" -> ((s, dir) =>
      JoinOps.q7NationVolume(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))),
    // TPC-H Q9 shape: profit by nation×year over name-matched parts;
    // supply cost modeled as 60% retail in exact integer cents.
    "j26_q9_profit" -> ((s, dir) =>
      JoinOps.q9ProductProfit(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))),
    // TPC-H Q10 shape: top-20 customers by returned revenue in a quarter
    // (both fact filters pushed below the key shuffle; top-k plan).
    "j27_q10_returns" -> ((s, dir) =>
      JoinOps.q10ReturnedItems(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))),
    // TPC-H Q12 shape: high/low-priority conditional counts per return
    // flag over one ship year — sum(when) on one partial aggregate.
    "j28_q12_priority" -> ((s, dir) =>
      JoinOps.q12PriorityByFlag(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // TPC-H Q13 shape: order-count histogram including the zero bucket —
    // exclusion filter in the LEFT JOIN's ON clause, two cascaded aggs.
    "j29_q13_custdist" -> ((s, dir) =>
      JoinOps.q13CustomerDistribution(Tables.customer(s, dir),
        Tables.orders(s, dir))),
    // TPC-H Q14 shape: promo revenue share of a month in floor permille.
    "j30_q14_promo" -> ((s, dir) =>
      JoinOps.q14PromoShare(Tables.lineitem(s, dir), Tables.part(s, dir))),
    // TPC-H Q16 shape: distinct-supplier counts per part bucket from the
    // observed (part, supplier) pairs, denylist as broadcast anti join.
    "j31_q16_suppcnt" -> ((s, dir) =>
      JoinOps.q16SupplierCount(Tables.lineitem(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir))),
    // TPC-H Q19 shape: OR-of-ANDs brand/size/qty branches with the
    // loosest-bound conjunct pushed to the scan.
    "j32_q19_disjunct" -> ((s, dir) =>
      JoinOps.q19DisjunctiveRevenue(Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    // TPC-H Q2 shape: per-part minimum-metric region supplier (ties
    // kept) — correlated scalar MIN decorrelated to one window-min.
    "j33_q2_mincost" -> ((s, dir) =>
      JoinOps.q2MinCostSupplier(Tables.lineitem(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    // TPC-H Q11 shape: per-part value for one nation's suppliers vs a
    // scalar grand-total fraction (decorrelated broadcast cross).
    "j34_q11_stock" -> ((s, dir) =>
      JoinOps.q11ImportantStock(Tables.lineitem(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir))),
    // TPC-H Q20 shape: dominant shipper per name-matched part-year via
    // keyed window total, then LEFT SEMI into supplier.
    "j35_q20_promo_suppliers" -> ((s, dir) =>
      JoinOps.q20PromoSuppliers(Tables.lineitem(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    "j1_broadcast_dim" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "j2_fact_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j3_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "j4_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j10_local_supplier" ->
      """SELECT n_name,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |       AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "j11_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |       AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "j6_star_join" ->
      """SELECT r_name, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j17_market_share" ->
      """WITH r AS (
        |  SELECT year(o_orderdate) AS yr,
        |         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |           AS cents,
        |         n_name = 'NATION_7' AS is_t
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |)
        |SELECT yr, CAST(SUM(cents) AS BIGINT) AS total_cents,
        |       CAST(SUM(CASE WHEN is_t THEN cents ELSE 0 END) AS BIGINT)
        |         AS nation_cents,
        |       CAST(SUM(CASE WHEN is_t THEN cents ELSE 0 END) * 1000
        |            // SUM(cents) AS BIGINT) AS share_permille
        |FROM r GROUP BY yr ORDER BY yr""".stripMargin,
    "j7_range_join" ->
      """SELECT bucket, COUNT(*) AS n, ROUND(MIN(value), 2) AS min_v, ROUND(MAX(value), 2) AS max_v
        |FROM events
        |JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 300.0), ('high', 300.0, 1000000000.0))
        |  AS b(bucket, lo, hi)
        |ON value >= lo AND value < hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "j12_proximity_join" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(COUNT(c.event_id) AS BIGINT) AS n_near_clicks
        |FROM events e LEFT JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        |  AND c.ts IS NOT NULL
        |  AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
        |WHERE e.event_type = 'error' AND e.user_id IS NOT NULL
        |  AND e.ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "j8_top_revenue" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "j9_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value,
        | c.event_id AS click_event_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.event_id >= c.event_id
        |ORDER BY p.event_id""".stripMargin,
    "j15_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS k
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *,
        |    last_value(CASE WHEN k = 0 THEN event_id END IGNORE NULLS) OVER w
        |      AS c_id,
        |    last_value(CASE WHEN k = 0 THEN value END IGNORE NULLS) OVER w
        |      AS c_val
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id, k
        |               ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT event_id, user_id, value,
        |  CASE WHEN event_id - c_id <= 500 THEN c_id END AS click_event_id,
        |  CASE WHEN event_id - c_id <= 500 THEN c_val END AS click_value
        |FROM m WHERE k = 1 ORDER BY event_id""".stripMargin,
    "j14_asof_native" ->
      """SELECT p.event_id, p.user_id, p.value,
        | c.event_id AS click_event_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.event_id >= c.event_id
        |ORDER BY p.event_id""".stripMargin,
    "j13_asof_forward" ->
      """SELECT p.event_id, p.user_id, p.value,
        | c.event_id AS click_event_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.event_id <= c.event_id
        |ORDER BY p.event_id""".stripMargin,
    "j16_blocked_er" ->
      """WITH names AS (
        |  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_records
        |  FROM part WHERE p_name IS NOT NULL GROUP BY 1
        |), tok AS (
        |  SELECT name, n_records,
        |         unnest(string_split(name, ' ')) AS token
        |  FROM names
        |), dfreq AS (
        |  SELECT token, COUNT(*) AS df FROM tok GROUP BY 1
        |), blocked AS (
        |  SELECT name, n_records, token AS block_key
        |  FROM tok JOIN dfreq USING (token)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY name
        |                             ORDER BY df, token) = 1
        |)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |       a.n_records AS n_a, b.n_records AS n_b
        |FROM blocked a JOIN blocked b
        |  ON a.block_key = b.block_key AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "j36_nullsafe_join" ->
      """WITH p AS (
        |  SELECT nullif(user_id % 10, 7) AS cohort,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS purchase_cents
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        |  GROUP BY 1
        |), c AS (
        |  SELECT nullif(user_id % 10, 7) AS cohort,
        |    CAST(COUNT(*) AS BIGINT) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |)
        |SELECT COALESCE(p.cohort, c.cohort) AS cohort,
        |       purchase_cents, n_clicks
        |FROM p FULL JOIN c ON p.cohort IS NOT DISTINCT FROM c.cohort
        |ORDER BY cohort NULLS FIRST""".stripMargin,
    "j37_er_scoring" ->
      """WITH reps AS (
        |  SELECT p_name AS name,
        |    (min({'pk': p_partkey, 'brand': p_brand, 'typ': p_type,
        |          'size': p_size})).pk AS pk,
        |    (min({'pk': p_partkey, 'brand': p_brand, 'typ': p_type,
        |          'size': p_size})).brand AS brand,
        |    (min({'pk': p_partkey, 'brand': p_brand, 'typ': p_type,
        |          'size': p_size})).typ AS typ,
        |    (min({'pk': p_partkey, 'brand': p_brand, 'typ': p_type,
        |          'size': p_size})).size AS size
        |  FROM part WHERE p_name IS NOT NULL GROUP BY 1
        |), tok AS (
        |  SELECT name, unnest(string_split(name, ' ')) AS token FROM reps
        |), dfreq AS (
        |  SELECT token, COUNT(*) AS df FROM tok GROUP BY 1
        |), blocked AS (
        |  SELECT t.name,
        |    (min({'df': d.df, 'token': t.token})).token AS block_key
        |  FROM tok t JOIN dfreq d USING (token)
        |  GROUP BY 1
        |), br AS (
        |  SELECT b.name, b.block_key, r.pk, r.brand, r.typ, r.size
        |  FROM blocked b JOIN reps r USING (name)
        |), pairs AS (
        |  SELECT a.pk AS pk_a, b.pk AS pk_b,
        |    CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |    (CASE WHEN a.brand = b.brand THEN 30 ELSE 0 END
        |     + CASE WHEN a.typ = b.typ THEN 25 ELSE 0 END
        |     + CASE WHEN abs(a.size - b.size) <= 1 THEN 15 ELSE 0 END
        |     + (6 - levenshtein(a.name, b.name)) * 10) AS score
        |  FROM br a JOIN br b
        |    ON a.block_key = b.block_key AND a.name < b.name
        |   AND levenshtein(a.name, b.name) <= 6
        |)
        |SELECT pk_a, pk_b, dist, CAST(score AS BIGINT) AS score,
        |  CAST(CASE WHEN score >= 70 THEN 1 ELSE 0 END AS BIGINT) AS is_match
        |FROM pairs WHERE score >= 40
        |ORDER BY 1, 2""".stripMargin,
    "j38_subquery_null_battery" ->
      """SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey IN
        |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |            ELSE o_custkey END FROM orders
        |     WHERE o_totalprice > 200000)) AS n_in,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey NOT IN
        |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |            ELSE o_custkey END FROM orders
        |     WHERE o_totalprice > 200000)) AS n_not_in,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o
        |     WHERE o.o_custkey = c.c_custkey
        |       AND o.o_totalprice > 200000)) AS n_not_exists,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey NOT IN
        |    (SELECT o_custkey FROM orders
        |     WHERE o_custkey IS NOT NULL
        |       AND o_totalprice > 200000)) AS n_not_in_nullfree""".stripMargin,
    "j18_q18_bigspenders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |           AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 200
        |)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |       epoch_us(o.o_orderdate) AS order_us,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |       big.total_qty
        |FROM big
        |JOIN orders o ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY total_cents DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "j19_q17_smallqty" ->
      """WITH bl AS (
        |  SELECT l.l_partkey,
        |         CAST(round(l.l_quantity) AS BIGINT) AS qty,
        |         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#4'
        |), pp AS (
        |  SELECT l_partkey AS agg_partkey, SUM(qty) AS sum_qty,
        |         COUNT(*) AS cnt
        |  FROM bl GROUP BY 1
        |)
        |SELECT 'Brand#4' AS brand, COUNT(*) AS n_lines,
        |       CAST(SUM(bl.price_cents) AS BIGINT) AS total_cents,
        |       CAST(SUM(bl.price_cents) // 7 AS BIGINT) AS avg_weekly_cents
        |FROM bl JOIN pp ON bl.l_partkey = pp.agg_partkey
        |WHERE bl.qty * pp.cnt * 5 < pp.sum_qty""".stripMargin,
    // The classic correlated EXISTS / NOT-EXISTS form — deliberately NOT
    // the aggregate rewrite the Spark side runs, so the hash gate proves
    // the decorrelated plan computes the textbook semantics.
    "j20_q21_waiting" ->
      """SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND CAST(l1.l_shipdate AS DATE) >
        |      CAST(o.o_orderdate AS DATE) + INTERVAL 1500 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND CAST(l3.l_shipdate AS DATE) >
        |          CAST(o.o_orderdate AS DATE) + INTERVAL 1500 DAY)
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s.s_suppkey LIMIT 100""".stripMargin,
    "j21_q15_topsupplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |             AS BIGINT)) AS revenue_cents
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1998-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name,
        |       CAST(r.revenue_cents AS BIGINT) AS revenue_cents
        |FROM revenue r
        |JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.revenue_cents = (SELECT MAX(revenue_cents) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,
    // Correlated textbook form on the oracle side (scalar subquery +
    // NOT EXISTS), vs the broadcast-cross decorrelated Spark plan.
    "j22_q22_opportunity" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |  WHERE c_nationkey IN (0, 3, 7, 11, 14, 18, 21)
        |)
        |SELECT c_nationkey, COUNT(*) AS n_cust,
        |       CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM pool p
        |WHERE p.cents * (SELECT COUNT(*) FROM pool WHERE cents > 0)
        |      > (SELECT CAST(SUM(cents) AS BIGINT) FROM pool WHERE cents > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The naive non-equi form (independently written, same as j12's
    // oracle): verifies the native plane-sweep physical operator.
    "j23_interval_native" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(COUNT(c.event_id) AS BIGINT) AS n_near_clicks
        |FROM events e LEFT JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        |  AND c.ts IS NOT NULL
        |  AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
        |WHERE e.event_type = 'error' AND e.user_id IS NOT NULL
        |  AND e.ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "j24_q4_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j25_q7_volume" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE (n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_7')
        |   OR (n2.n_name = 'NATION_7' AND n1.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "j26_q9_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |        AS BIGINT)
        |      - (CAST(round(p_retailprice * 100) AS BIGINT)
        |         * CAST(round(l_quantity) AS BIGINT) * 3) // 5)
        |    AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "j27_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "j28_q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE EXTRACT(year FROM l_shipdate) = 1997
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j29_q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "j30_q14_promo" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) * 1000
        |    // SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |         AS BIGINT)) AS BIGINT) AS promo_permille
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'""".stripMargin,
    "j31_q16_suppcnt" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "j32_q19_disjunct" ->
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    "j33_q2_mincost" ->
      """WITH cand AS (
        |  SELECT p_partkey, p_type, s_suppkey, s_name, n_name,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |  JOIN part ON p_partkey = l_partkey
        |    AND p_size = 15 AND p_type = 'STANDARD'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |)
        |SELECT p_partkey, p_type, s_suppkey, s_name, n_name, bal_cents
        |FROM cand c
        |WHERE bal_cents = (SELECT MIN(bal_cents) FROM cand c2
        |                   WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "j34_q11_stock" ->
      """WITH v AS (
        |  SELECT p_partkey,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)
        |      * CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
        |      AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = 7
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_partkey
        |), t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM v)
        |SELECT p_partkey, value_cents FROM v, t
        |WHERE value_cents * 1000 > total_cents
        |ORDER BY value_cents DESC, p_partkey""".stripMargin,
    "j35_q20_promo_suppliers" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part
        |    ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |  WHERE EXTRACT(year FROM l_shipdate) = 1997
        |  GROUP BY 1, 2
        |), w AS (
        |  SELECT l_suppkey, qty,
        |         SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
        |  FROM sp
        |)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM w WHERE qty * 2 > part_total)
        |ORDER BY s_suppkey""".stripMargin,
  )
}
