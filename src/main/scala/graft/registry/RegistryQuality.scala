package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, data-quality tier (dq*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryQuality {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Data-quality tier: single-pass column profile (unpivot-then-agg, one
    // distinct rewrite) and a one-scan expectation report.
    "dq1_profile" -> ((s, dir) => Quality.profile(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount"))),
    "dq2_expectations" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Quality.expectations(Tables.orders(s, dir), Seq(
        "status_known" -> col("o_orderstatus").isin("F", "O", "P"),
        "total_positive" -> (col("o_totalprice") > 0),
        "total_under_400k" -> (col("o_totalprice") <= 400000)))
    }),
    // Governance masking: sha2-256 identifiers + banded quasi-identifiers.
    "dq3_masking" -> ((s, dir) => Quality.maskPii(Tables.customer(s, dir))),
    // Percentile outlier gate: exact [p(1/64), p(63/64)] band over integer
    // cents (binary-exact fractions -> engine-identical interpolation).
    "dq4_outlier_gate" -> ((s, dir) => Quality.outlierGate(Tables.lineitem(s, dir))),
    // k-anonymity audit over the quasi-identifier triple dq3 generalizes:
    // every violating combination with its group size (the suppression
    // worklist). One map-side-combined aggregate, state ∝ distinct tuples.
    "dq8_k_anonymity" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, floor}
      Quality.kAnonymityAudit(
        Tables.customer(s, dir).select(col("c_nationkey"), col("c_mktsegment"),
          (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("acctbal_band")),
        Seq("c_nationkey", "c_mktsegment", "acctbal_band"), 5)
    }),
    // l-diversity audit (homogeneity-attack check): quasi-id groups whose
    // sensitive attribute (account band) shows < 5 distinct values.
    "dq9_l_diversity" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, floor}
      Quality.lDiversityAudit(
        Tables.customer(s, dir).select(col("c_nationkey"), col("c_mktsegment"),
          (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("acctbal_band")),
        Seq("c_nationkey", "c_mktsegment"), "acctbal_band", 5)
    }),
    // Key-skew diagnostic: top-5 heaviest o_custkey groups with size
    // relative to the mean group (the pre-flight check before salting).
    "dq5_skew_report" -> ((s, dir) => Quality.skewReport(Tables.orders(s, dir), "o_custkey")),
    // Referential-integrity publish gate: FK orphans + PK uniqueness for
    // the star schema's four core constraints, one row each.
    "dq6_integrity" -> ((s, dir) => Quality.integrityAudit(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir))),
    // Hourly event-rate anomaly monitor: per type, hours deviating from
    // the hourly median by > 3x the MAD (robust, integer-exact; LOWER
    // medians picked positionally). Corpus collapses to (hour, type)
    // counts first — all median work runs on hours, not events.
    "dq7_rate_anomalies" -> ((s, dir) => Quality.rateAnomalies(Tables.events(s, dir))),
    // Event-time disorder audit: per-type lateness vs the running ingest
    // high-water mark - the measurement behind a watermark delay choice.
    "dq10_lateness_audit" -> ((s, dir) => Quality.latenessAudit(Tables.events(s, dir))),
    // Hampel filter: per-user rolling-median/MAD outliers (integer picks).
    "dq11_hampel_outliers" -> ((s, dir) => Quality.hampelOutliers(Tables.events(s, dir))),
    // Benford first-digit forensics on order totals: digit from the
    // integer-cents rendering (never float log10/formatting), permille
    // shares vs literal Benford expectations; one 9-key hash aggregate.
    "dq12_benford" -> ((s, dir) => Quality.benfordDigits(Tables.orders(s, dir))),
    // Two-sample KS drift per series: unbinned sup-norm ECDF distance
    // between time halves — the location-shift detector dq26's binned
    // TVD can miss; one value-keyed aggregate + one distinct-value window.
    "dq32_ks_drift" -> ((s, dir) => Quality.ksDrift(Tables.events(s, dir))),
    // Gain/lift deciles per source: ntile(10) over the total (score,
    // doc_id) order — the top-p% capture/lift table behind dq18's AUC.
    "dq33_lift_deciles" -> ((s, dir) =>
      Evaluation.liftDeciles(Tables.documents(s, dir))),
    // Per-column Gini impurity + inverse-Simpson effective categories:
    // the rational (log-free) concentration screen behind dq1's profile.
    "dq34_gini_impurity" -> ((s, dir) =>
      Quality.giniImpurity(Tables.events(s, dir))),
    // Winsorized per-priority stats: exact discrete p05/p95 clamp via
    // count-based order statistics — no per-row sort, bounds broadcast.
    "dq35_winsorized_stats" -> ((s, dir) =>
      Quality.winsorizedStats(Tables.orders(s, dir))),
    // Weekday-adjusted volume anomalies: median-of-4 same-weekday
    // baseline kept as an integer sum, exact permille deviation.
    "dq36_volume_anomaly" -> ((s, dir) =>
      Quality.volumeAnomalies(Tables.events(s, dir))),
    // Exact Pearson sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) per
    // group — one map-side-combining aggregate, FP left to the consumer.
    "dq13_correlation_stats" -> ((s, dir) =>
      Quality.correlationStats(Tables.lineitem(s, dir))),
    // CUSUM drift detection: the max(0, S+y) recurrence as prefix-sum
    // minus running-min — two windows, one exchange, integer-exact.
    "dq14_cusum" -> ((s, dir) => Quality.cusumRate(Tables.events(s, dir))),
    // t-closeness (privacy triad leg 3): integer-exact EMD between each
    // class's and the global sensitive-decile distribution.
    "dq15_t_closeness" -> ((s, dir) =>
      Quality.tClosenessAudit(Tables.customer(s, dir))),
    // Functional-dependency audit: exact violating-key counts per
    // candidate A→B via TANE-style stripped partitions (distinct pairs
    // first, so shuffle state is pair cardinality, not row count).
    "dq16_fd_audit" -> ((s, dir) =>
      Quality.fdAudit(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Header-vs-lines financial reconciliation per status, integer cents;
    // header-only orders are their own category, not zero-diff matches.
    "dq17_reconciliation" -> ((s, dir) =>
      Quality.reconcile(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Exact AUC (Mann-Whitney rank-sum) per source: does document length
    // separate lang='en'? Integer u2 + floor permille, no FP ranks.
    "dq18_auc" -> ((s, dir) => Evaluation.aucStats(Tables.documents(s, dir))),
    // Calibration table: empirical P(en) per 100-char length bin.
    "dq19_calibration" -> ((s, dir) =>
      Evaluation.calibrationBins(Tables.documents(s, dir))),
    // Operating-point sweep: confusion matrix + precision/recall permille
    // for "n_chars >= t => en" at six thresholds, one fan-out scan.
    "dq20_pr_curve" -> ((s, dir) =>
      Evaluation.prCurve(Tables.documents(s, dir))),
    // CBO cardinality contract: exact self-join size vs the uniform and
    // heavy-hitter-aware estimates, with permille error for each.
    "dq21_join_estimate" -> ((s, dir) =>
      Evaluation.joinCardinalityEstimate(Tables.events(s, dir))),
    // Order-independent content checksums (bit-XOR of canonical row
    // hashes + count/min/max) for three tables - the publish-integrity
    // artifact any engine reproduces.
    "dq22_table_checksum" -> ((s, dir) =>
      Quality.tableChecksums(Tables.orders(s, dir), Tables.lineitem(s, dir),
        Tables.customer(s, dir))),
    // Per-type column completeness matrix in integer permille — one
    // keyed aggregate, one sum(when) per nullable column.
    "dq23_completeness" -> ((s, dir) =>
      Quality.completenessMatrix(Tables.events(s, dir))),
    // Exact p50/p90/p99 order->ship latency days per priority class via
    // a per-group histogram walk (no approx percentile, no global sort).
    "dq24_fulfillment_sla" -> ((s, dir) =>
      Quality.fulfillmentLatency(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // Duplicate-payment audit: equi-join on (customer, exact cents)
    // with a day-window conjunct — double-submit forensics.
    "dq25_duplicate_payments" -> ((s, dir) =>
      Quality.duplicatePayments(Tables.orders(s, dir))),
    // First-half vs second-half total-variation drift in floor permille.
    "dq26_distribution_drift" -> ((s, dir) =>
      Quality.distributionDrift(Tables.events(s, dir))),
    // Per-series event_id sequence-gap audit (CDC offset integrity).
    "dq27_sequence_gaps" -> ((s, dir) =>
      Quality.sequenceGaps(Tables.events(s, dir))),
    // Lorenz-checkpoint revenue concentration: top 1/5/10% customer share.
    "dq28_concentration" -> ((s, dir) =>
      Quality.revenueConcentration(Tables.orders(s, dir))),
    // Cents-remainder distribution — the trailing-digit fraud screen.
    "dq29_price_endings" -> ((s, dir) =>
      Quality.priceEndings(Tables.orders(s, dir))),
    // Error-budget burn per day (integer cross-multiplied rates).
    "dq30_slo_burn" -> ((s, dir) => Quality.sloBurn(Tables.events(s, dir))),
    // Same-(user, microsecond) pile-ups: the double-fire audit.
    "dq31_ts_collisions" -> ((s, dir) =>
      Quality.timestampCollisions(Tables.events(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    "dq1_profile" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |)
        |SELECT col_name,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |       CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
        |       MIN(value) AS min_v, MAX(value) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "dq2_expectations" ->
      """WITH r AS (
        |  SELECT 'status_known' AS rule,
        |         CAST(COUNT(*) AS BIGINT) AS n_checked,
        |         CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P')) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'total_positive', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'total_under_400k', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN NOT (o_totalprice <= 400000) THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |)
        |SELECT rule, n_checked, n_violations FROM r ORDER BY rule""".stripMargin,
    "dq3_masking" ->
      """SELECT c_custkey,
        |       sha256(c_name) AS name_masked,
        |       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
        |       c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "dq4_outlier_gate" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), b AS (
        |  SELECT CAST(ceil(quantile_cont(cents, 0.015625)) AS BIGINT) AS lo,
        |         CAST(floor(quantile_cont(cents, 0.984375)) AS BIGINT) AS hi
        |  FROM c
        |)
        |SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  MIN(CASE WHEN cents BETWEEN lo AND hi THEN cents END) AS kept_min,
        |  MAX(CASE WHEN cents BETWEEN lo AND hi THEN cents END) AS kept_max
        |FROM c, b GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "dq8_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
        |       CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM customer
        |GROUP BY 1, 2, 3
        |HAVING COUNT(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, acctbal_band""".stripMargin,
    "dq9_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(COUNT(*) AS BIGINT) AS group_size,
        |       CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) * 1000
        |                                AS BIGINT)) AS BIGINT)
        |         AS sensitive_diversity
        |FROM customer
        |GROUP BY 1, 2
        |HAVING COUNT(DISTINCT CAST(floor(c_acctbal / 1000) * 1000
        |                           AS BIGINT)) < 5
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "dq5_skew_report" ->
      """WITH sizes AS (
        |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
        |), stats AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows, COUNT(*) AS n_keys
        |  FROM sizes
        |)
        |SELECT o_custkey, cnt, total_rows, n_keys,
        |       CAST(cnt * 1000 // (total_rows // n_keys) AS BIGINT) AS x_mean_permille
        |FROM sizes, stats ORDER BY cnt DESC, o_custkey LIMIT 5""".stripMargin,
    "dq6_integrity" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS relation,
        |    (SELECT COUNT(*) FROM lineitem) AS n_checked,
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'orders.o_orderkey unique',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT CAST(SUM(cnt - 1) AS BIGINT) FROM
        |      (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey))
        |  UNION ALL
        |  SELECT 'customer.c_custkey unique',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT CAST(SUM(cnt - 1) AS BIGINT) FROM
        |      (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey))
        |) ORDER BY relation""".stripMargin,
    "dq7_rate_anomalies" ->
      """WITH h AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS hr, event_type,
        |         COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM h
        |), med AS (
        |  SELECT event_type, n AS med_n FROM m WHERE rn - 1 = (cnt - 1) // 2
        |), d AS (
        |  SELECT h.event_type, h.n, med.med_n, ABS(h.n - med.med_n) AS dev
        |  FROM h JOIN med USING (event_type)
        |), m2 AS (
        |  SELECT event_type, dev,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM d
        |), mad AS (
        |  SELECT event_type, dev AS mad_n FROM m2 WHERE rn - 1 = (cnt - 1) // 2
        |)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       d.med_n, mad.mad_n,
        |       CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_n THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_anomalous
        |FROM d JOIN mad USING (event_type)
        |GROUP BY d.event_type, d.med_n, mad.mad_n
        |ORDER BY event_type""".stripMargin,
    "dq10_lateness_audit" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |), d AS (
        |  SELECT event_type,
        |         MAX(us) OVER (PARTITION BY event_type ORDER BY event_id
        |                       ROWS UNBOUNDED PRECEDING) - us AS disorder
        |  FROM e
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CASE WHEN disorder > 3600000000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_late,
        |       CAST(MAX(disorder) AS BIGINT) AS max_disorder_us
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq11_hampel_outliers" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT event_id, user_id, cents,
        |         list_sort(list(cents) OVER w) AS a7
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |), g AS (
        |  SELECT *, a7[CAST(ceil(0.5 * len(a7)) AS INT)] AS med FROM f
        |), h AS (
        |  SELECT *, list_sort(list_transform(a7, x -> abs(x - med)))
        |         [CAST(ceil(0.5 * len(a7)) AS INT)] AS mad
        |  FROM g
        |)
        |SELECT event_id, user_id, cents, med AS med_7, mad AS mad_7
        |FROM h WHERE len(a7) >= 5 AND abs(cents - med) > 3 * mad
        |ORDER BY event_id""".stripMargin,
    "dq12_benford" ->
      """WITH d AS (
        |  SELECT CAST(SUBSTR(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        |), c AS (
        |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
        |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        |exp AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
        |               unnest([301,176,124,96,79,66,57,51,45]) AS bp)
        |SELECT c.digit, c.n,
        |       CAST(c.n * 1000 // t.total AS BIGINT) AS share_permille,
        |       CAST(exp.bp AS BIGINT) AS benford_permille,
        |       CAST(c.n * 1000 // t.total - exp.bp AS BIGINT)
        |         AS delta_permille
        |FROM c CROSS JOIN t JOIN exp ON c.digit = exp.digit
        |ORDER BY c.digit""".stripMargin,
    "dq32_ks_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM e),
        |v AS (
        |  SELECT event_type, cents,
        |    CAST(SUM(CASE WHEN us <= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN us > mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e CROSS JOIN m GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, cents,
        |    SUM(c1) OVER (PARTITION BY event_type ORDER BY cents) AS cum1,
        |    SUM(c2) OVER (PARTITION BY event_type ORDER BY cents) AS cum2,
        |    SUM(c1) OVER (PARTITION BY event_type) AS n1,
        |    SUM(c2) OVER (PARTITION BY event_type) AS n2
        |  FROM v
        |)
        |SELECT event_type, CAST(MAX(n1) AS BIGINT) AS n1,
        |       CAST(MAX(n2) AS BIGINT) AS n2,
        |       CAST(COUNT(*) AS BIGINT) AS n_values,
        |       CAST(MAX(abs(CAST(cum1 AS HUGEINT) * n2
        |                    - CAST(cum2 AS HUGEINT) * n1)) * 1000
        |            // (CAST(MAX(n1) AS HUGEINT) * MAX(n2)) AS BIGINT)
        |         AS ks_permille
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq33_lift_deciles" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
        |    ntile(10) OVER (PARTITION BY source
        |                    ORDER BY n_chars DESC, doc_id) AS decile
        |  FROM documents
        |), g AS (
        |  SELECT source, CAST(decile AS BIGINT) AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(is_pos) AS BIGINT) AS n_pos
        |  FROM d GROUP BY 1, 2
        |), c AS (
        |  SELECT source, decile, n_rows, n_pos,
        |    SUM(n_rows) OVER (PARTITION BY source ORDER BY decile) AS cum_rows,
        |    SUM(n_pos) OVER (PARTITION BY source ORDER BY decile) AS cum_pos,
        |    SUM(n_rows) OVER (PARTITION BY source) AS tot_rows,
        |    SUM(n_pos) OVER (PARTITION BY source) AS tot_pos
        |  FROM g
        |)
        |SELECT source, decile, n_rows, n_pos,
        |  CAST(cum_pos * 1000 // nullif(tot_pos, 0) AS BIGINT)
        |    AS capture_permille,
        |  CAST(cum_pos * tot_rows * 1000 // nullif(cum_rows * tot_pos, 0)
        |       AS BIGINT) AS lift_permille
        |FROM c ORDER BY 1, 2""".stripMargin,
    "dq34_gini_impurity" ->
      """WITH u AS (
        |  SELECT 'event_type' AS col_name, CAST(event_type AS VARCHAR) AS v
        |  FROM events WHERE event_type IS NOT NULL
        |  UNION ALL
        |  SELECT 'user_id', CAST(user_id AS VARCHAR)
        |  FROM events WHERE user_id IS NOT NULL
        |  UNION ALL
        |  SELECT 'value_cents',
        |         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM u GROUP BY 1, 2
        |)
        |SELECT col_name, CAST(SUM(c) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(1000 * (CAST(SUM(c) AS HUGEINT) * SUM(c)
        |               - SUM(CAST(c AS HUGEINT) * c))
        |       // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT)
        |    AS gini_permille,
        |  CAST((CAST(SUM(c) AS HUGEINT) * SUM(c))
        |       // SUM(CAST(c AS HUGEINT) * c) AS BIGINT)
        |    AS effective_categories
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq35_winsorized_stats" ->
      """WITH vals AS (
        |  SELECT o_orderpriority AS pri,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |), counts AS (
        |  SELECT pri, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM vals GROUP BY 1, 2
        |), cum AS (
        |  SELECT pri, cents,
        |         SUM(cnt) OVER (PARTITION BY pri ORDER BY cents) AS cum,
        |         SUM(cnt) OVER (PARTITION BY pri) AS n
        |  FROM counts
        |), b AS (
        |  SELECT pri, MAX(n) AS n,
        |    MIN(CASE WHEN cum >= (n - 1) * 5 // 100 + 1 THEN cents END)
        |      AS lo_cents,
        |    MIN(CASE WHEN cum >= (n - 1) * 95 // 100 + 1 THEN cents END)
        |      AS hi_cents
        |  FROM cum GROUP BY 1
        |)
        |SELECT v.pri AS o_orderpriority,
        |  CAST(MAX(b.n) AS BIGINT) AS n_orders,
        |  CAST(MAX(b.lo_cents) AS BIGINT) AS lo_cents,
        |  CAST(MAX(b.hi_cents) AS BIGINT) AS hi_cents,
        |  CAST(SUM(GREATEST(LEAST(v.cents, b.hi_cents), b.lo_cents))
        |       AS BIGINT) AS wins_sum_cents,
        |  CAST(SUM(CASE WHEN v.cents < b.lo_cents THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clamped_low,
        |  CAST(SUM(CASE WHEN v.cents > b.hi_cents THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clamped_high,
        |  CAST(SUM(GREATEST(LEAST(v.cents, b.hi_cents), b.lo_cents))
        |       // MAX(b.n) AS BIGINT) AS wins_mean_cents
        |FROM vals v JOIN b ON v.pri = b.pri
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq36_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1
        |), r AS (
        |  SELECT a.day, a.c, COUNT(*) AS n_refs,
        |         list_sort(list(b.c)) AS arr
        |  FROM daily a
        |  JOIN (SELECT CAST(unnest(ARRAY[7, 14, 21, 28]) AS BIGINT) AS off)
        |    ON TRUE
        |  JOIN daily b ON b.day = a.day - off
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT day, c, arr[2] + arr[3] AS med2
        |  FROM r WHERE n_refs = 4
        |)
        |SELECT day, c, med2,
        |  c * 2000 // NULLIF(med2, 0) AS dev_permille,
        |  CAST(CASE WHEN c * 2000 // NULLIF(med2, 0) > 1500
        |             OR c * 2000 // NULLIF(med2, 0) < 500
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM m ORDER BY day""".stripMargin,
    "dq13_correlation_stats" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(x) AS BIGINT) AS sum_x,
        |       CAST(SUM(y) AS BIGINT) AS sum_y,
        |       CAST(SUM(x * x) AS BIGINT) AS sum_xx,
        |       CAST(SUM(y * y) AS BIGINT) AS sum_yy,
        |       CAST(SUM(x * y) AS BIGINT) AS sum_xy
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq14_cusum" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |), bars AS (
        |  SELECT event_type, (us // 3600000000) * 3600000000 AS bar_us,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, bar_us, n,
        |         SUM(n) OVER (PARTITION BY event_type) //
        |           COUNT(n) OVER (PARTITION BY event_type) AS target
        |  FROM bars
        |), p AS (
        |  SELECT event_type, bar_us, n, target,
        |    SUM(n - target) OVER (PARTITION BY event_type ORDER BY bar_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
        |  FROM t
        |), c AS (
        |  SELECT event_type, bar_us, n, target,
        |    pre - LEAST(0, MIN(pre) OVER (PARTITION BY event_type ORDER BY bar_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
        |  FROM p
        |)
        |SELECT event_type, bar_us, n, CAST(target AS BIGINT) AS target,
        |       CAST(cusum AS BIGINT) AS cusum, cusum >= 20 AS drifting
        |FROM c ORDER BY event_type, bar_us""".stripMargin,
    "dq15_t_closeness" ->
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 110000
        |           AS bucket
        |  FROM customer
        |), gh AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS g FROM base GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(g) AS BIGINT) AS gtot,
        |         CAST(COUNT(*) AS BIGINT) AS nb FROM gh
        |), ch AS (
        |  SELECT c_nationkey, c_mktsegment, bucket,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3
        |), cls AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS ctot
        |  FROM ch GROUP BY 1, 2
        |), grid AS (
        |  SELECT cls.c_nationkey, cls.c_mktsegment, cls.ctot,
        |         gh.bucket, gh.g, tot.gtot, tot.nb, COALESCE(ch.c, 0) AS c
        |  FROM cls CROSS JOIN gh CROSS JOIN tot
        |  LEFT JOIN ch ON ch.c_nationkey = cls.c_nationkey
        |    AND ch.c_mktsegment = cls.c_mktsegment AND ch.bucket = gh.bucket
        |), cum AS (
        |  SELECT *, SUM(c * gtot - g * ctot) OVER (
        |    PARTITION BY c_nationkey, c_mktsegment ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
        |  FROM grid
        |)
        |SELECT c_nationkey, c_mktsegment, ctot,
        |       CAST(SUM(ABS(cumv)) AS BIGINT) AS emd_num,
        |       CAST(ctot * gtot * (nb - 1) AS BIGINT) AS emd_den,
        |       SUM(ABS(cumv)) * 4 > ctot * gtot * (nb - 1) AS breach
        |FROM cum GROUP BY c_nationkey, c_mktsegment, ctot, gtot, nb
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "dq16_fd_audit" -> {
      def one(table: String, det: String, dep: String): String =
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |       CAST(COUNT(*) AS BIGINT) AS n_keys,
           |       CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_violating_keys,
           |       CAST(MAX(ndep) AS BIGINT) AS max_distinct_dep,
           |       SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
           |FROM (SELECT k, COUNT(*) AS ndep
           |      FROM (SELECT DISTINCT $det AS k, $dep AS v FROM $table
           |            WHERE $det IS NOT NULL) GROUP BY k)""".stripMargin
      Seq(
        one("orders", "o_orderkey", "o_custkey"),
        one("orders", "o_custkey", "o_orderpriority"),
        one("orders", "o_orderdate", "o_orderstatus"),
        one("lineitem", "l_orderkey", "l_returnflag"),
        one("lineitem", "l_partkey", "l_suppkey"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY determinant, dependent")
    },
    "dq17_reconciliation" ->
      """WITH l AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
        |                * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS lines_cents
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT o.o_orderstatus,
        |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
        |         l.lines_cents
        |  FROM orders o LEFT JOIN l USING (o_orderkey)
        |)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN lines_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_lines,
        |  CAST(SUM(CASE WHEN lines_cents IS NOT NULL
        |                 AND header_cents = lines_cents THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_reconciled,
        |  CAST(SUM(CASE WHEN lines_cents IS NOT NULL
        |                 AND header_cents <> lines_cents THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_mismatched,
        |  CAST(MAX(CASE WHEN lines_cents IS NOT NULL
        |                THEN abs(header_cents - lines_cents) END) AS BIGINT)
        |    AS max_abs_diff_cents,
        |  CAST(SUM(CASE WHEN lines_cents IS NOT NULL
        |                THEN abs(header_cents - lines_cents) ELSE 0 END)
        |       AS BIGINT) AS total_abs_diff_cents
        |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "dq18_auc" ->
      """WITH s AS (
        |  SELECT source, n_chars AS score,
        |         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
        |         SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n
        |  FROM documents GROUP BY 1, 2
        |), c AS (
        |  SELECT source, p, n,
        |         COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn
        |  FROM s
        |)
        |SELECT source,
        |       CAST(SUM(p) AS BIGINT) AS n_pos,
        |       CAST(SUM(n) AS BIGINT) AS n_neg,
        |       CAST(SUM(p * (2 * cn + n)) AS BIGINT) AS u2,
        |       CAST(SUM(p * (2 * cn + n)) * 1000
        |            // (2 * SUM(p) * SUM(n)) AS BIGINT) AS auc_permille
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "dq19_calibration" ->
      """SELECT n_chars // 100 AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_pos,
        |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000
        |            // COUNT(*) AS BIGINT) AS pos_permille
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq20_pr_curve" ->
      """WITH th AS (
        |  SELECT unnest([100, 200, 300, 400, 600, 800]) AS threshold
        |), c AS (
        |  SELECT th.threshold,
        |    SUM(CASE WHEN d.n_chars >= th.threshold AND d.lang = 'en'
        |             THEN 1 ELSE 0 END) AS tp,
        |    SUM(CASE WHEN d.n_chars >= th.threshold AND d.lang <> 'en'
        |             THEN 1 ELSE 0 END) AS fp,
        |    SUM(CASE WHEN d.n_chars < th.threshold AND d.lang = 'en'
        |             THEN 1 ELSE 0 END) AS fn,
        |    SUM(CASE WHEN d.n_chars < th.threshold AND d.lang <> 'en'
        |             THEN 1 ELSE 0 END) AS tn
        |  FROM documents d CROSS JOIN th GROUP BY 1
        |)
        |SELECT CAST(threshold AS BIGINT) AS threshold,
        |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
        |       CAST(tp * 1000 // (tp + fp) AS BIGINT) AS precision_permille,
        |       CAST(tp * 1000 // (tp + fn) AS BIGINT) AS recall_permille
        |FROM c ORDER BY threshold""".stripMargin,
    "dq21_join_estimate" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS c FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1
        |), heavy AS (
        |  SELECT COALESCE(SUM(c * c), 0) AS heavy_pairs,
        |         COALESCE(SUM(c), 0) AS heavy_rows,
        |         COUNT(*) AS heavy_keys
        |  FROM (SELECT c FROM counts ORDER BY c DESC, user_id LIMIT 20)
        |), tot AS (
        |  SELECT SUM(c) AS n_rows, COUNT(*) AS n_keys,
        |         SUM(c * c) AS exact_pairs
        |  FROM counts
        |)
        |SELECT CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_keys AS BIGINT) AS n_keys,
        |       CAST(exact_pairs AS BIGINT) AS exact_pairs,
        |       CAST(n_rows * n_rows // n_keys AS BIGINT) AS est_uniform,
        |       CAST(heavy_pairs + (n_rows - heavy_rows) * (n_rows - heavy_rows)
        |            // NULLIF(n_keys - heavy_keys, 0) AS BIGINT) AS est_hybrid,
        |       CAST((n_rows * n_rows // n_keys) * 1000 // exact_pairs
        |            AS BIGINT) AS uniform_permille,
        |       CAST((heavy_pairs + (n_rows - heavy_rows) * (n_rows - heavy_rows)
        |             // NULLIF(n_keys - heavy_keys, 0)) * 1000 // exact_pairs
        |            AS BIGINT) AS hybrid_permille
        |FROM tot CROSS JOIN heavy""".stripMargin,
    "dq22_table_checksum" ->
      """WITH co AS (
        |  SELECT CAST('0x' || substr(md5(
        |           c_custkey || '|' || c_name || '|' || c_nationkey || '|' ||
        |           CAST(round(c_acctbal * 100) AS BIGINT) || '|' ||
        |           c_mktsegment), 1, 15) AS BIGINT) AS h
        |  FROM customer
        |), lo AS (
        |  SELECT CAST('0x' || substr(md5(
        |           l_orderkey || '|' || l_linenumber || '|' || l_partkey
        |           || '|' || l_suppkey || '|' ||
        |           CAST(round(l_quantity) AS BIGINT) || '|' ||
        |           CAST(round(l_extendedprice * 100) AS BIGINT) || '|' ||
        |           l_returnflag || '|' || l_linestatus || '|' ||
        |           epoch_us(l_shipdate)), 1, 15) AS BIGINT) AS h
        |  FROM lineitem
        |), oo AS (
        |  SELECT CAST('0x' || substr(md5(
        |           o_orderkey || '|' || o_custkey || '|' || o_orderstatus
        |           || '|' || CAST(round(o_totalprice * 100) AS BIGINT) || '|' ||
        |           epoch_us(o_orderdate) || '|' || o_orderpriority), 1, 15)
        |         AS BIGINT) AS h
        |  FROM orders
        |)
        |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(xor_sig AS BIGINT) AS xor_sig,
        |       CAST(min_sig AS BIGINT) AS min_sig,
        |       CAST(max_sig AS BIGINT) AS max_sig
        |FROM (
        |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
        |         bit_xor(h) AS xor_sig, MIN(h) AS min_sig, MAX(h) AS max_sig
        |  FROM co
        |  UNION ALL
        |  SELECT 'lineitem', COUNT(*), bit_xor(h), MIN(h), MAX(h) FROM lo
        |  UNION ALL
        |  SELECT 'orders', COUNT(*), bit_xor(h), MIN(h), MAX(h) FROM oo
        |) ORDER BY table_name""".stripMargin,
    "dq23_completeness" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |    // COUNT(*) AS BIGINT) AS user_id_permille,
        |  CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |    // COUNT(*) AS BIGINT) AS value_permille,
        |  CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |    // COUNT(*) AS BIGINT) AS props_permille,
        |  CAST(SUM(CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END) * 1000
        |    // COUNT(*) AS BIGINT) AS ts_permille
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq24_fulfillment_sla" ->
      """WITH lat AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), h AS (
        |  SELECT o_orderpriority, days, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lat GROUP BY 1, 2
        |), cw AS (
        |  SELECT o_orderpriority, days, c,
        |    CAST(SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        |  FROM h
        |)
        |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_lines,
        |  CAST(MIN(CASE WHEN cum * 2 >= n THEN days END) AS BIGINT) AS p50_days,
        |  CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN days END) AS BIGINT)
        |    AS p90_days,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN days END) AS BIGINT)
        |    AS p99_days
        |FROM cw GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "dq25_duplicate_payments" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS band,
        |         CAST(o_orderdate AS DATE) AS d
        |  FROM orders
        |)
        |SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
        |       a.band, a.cents - b.cents AS delta_cents,
        |       CAST(abs(date_diff('day', b.d, a.d)) AS BIGINT) AS days_apart
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey AND a.band = b.band
        |  AND a.o_orderkey < b.o_orderkey
        |  AND abs(date_diff('day', b.d, a.d)) <= 90
        |ORDER BY a.o_custkey, order_a, order_b""".stripMargin,
    "dq26_distribution_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) // 5000 AS bin
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM e),
        |b AS (
        |  SELECT event_type, bin,
        |    CAST(SUM(CASE WHEN us <= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN us > mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e CROSS JOIN m GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
        |         CAST(SUM(c2) AS BIGINT) AS n2
        |  FROM b GROUP BY 1
        |)
        |SELECT b.event_type, CAST(MAX(t.n1) AS BIGINT) AS n1,
        |       CAST(MAX(t.n2) AS BIGINT) AS n2,
        |       CAST(COUNT(*) AS BIGINT) AS n_bins,
        |       CAST(SUM(abs(c1 * t.n2 - c2 * t.n1)) * 500
        |              // (MAX(t.n1) * MAX(t.n2)) AS BIGINT) AS tvd_permille
        |FROM b JOIN t USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq27_sequence_gaps" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         event_id - lag(event_id) OVER (PARTITION BY event_type
        |                                        ORDER BY event_id) - 1 AS gap
        |  FROM events WHERE event_type IS NOT NULL AND event_id IS NOT NULL
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ids,
        |       CAST(MIN(event_id) AS BIGINT) AS min_id,
        |       CAST(MAX(event_id) AS BIGINT) AS max_id,
        |       CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS BIGINT)
        |         AS n_missing,
        |       CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_gap_runs,
        |       CAST(MAX(CASE WHEN gap > 0 THEN gap END) AS BIGINT) AS max_gap
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq28_concentration" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS rev
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        |), r AS (
        |  SELECT rev, o_custkey,
        |         row_number() OVER (ORDER BY rev DESC, o_custkey) AS rank,
        |         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM pc
        |), t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(rev) AS BIGINT) AS total_cents
        |  FROM pc
        |)
        |SELECT CAST(CASE rank WHEN greatest(n_customers // 100, 1) THEN 1
        |            WHEN greatest(n_customers // 20, 1) THEN 5
        |            ELSE 10 END AS BIGINT) AS top_pct,
        |       CAST(rank AS BIGINT) AS n_top_customers, n_customers,
        |       CAST(cum AS BIGINT) AS top_cents, total_cents,
        |       CAST(cum * 1000 // total_cents AS BIGINT) AS share_permille
        |FROM r, t
        |WHERE rank = greatest(n_customers // 100, 1)
        |   OR rank = greatest(n_customers // 20, 1)
        |   OR rank = greatest(n_customers // 10, 1)
        |ORDER BY top_pct""".stripMargin,
    "dq29_price_endings" ->
      """WITH e AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |), c AS (
        |  SELECT ending, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
        |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT ending, n, CAST(n * 10000 // total AS BIGINT) AS share_bp
        |FROM c, t ORDER BY n DESC, ending LIMIT 10""".stripMargin,
    "dq30_slo_burn" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         epoch_us(ts) // 3600000000 AS hour,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_err
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(SUM(n_err) AS BIGINT) AS n_errors,
        |  CAST(SUM(CASE WHEN n_err * 1000 > 150 * n THEN 1 ELSE 0 END)
        |       AS BIGINT) AS hours_over_budget,
        |  CAST(MAX(n_err * 1000 // n) AS BIGINT) AS worst_hour_permille,
        |  CAST(SUM(n_err) * 1000000 // (SUM(n) * 150) AS BIGINT)
        |    AS burn_multiple_permille
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq31_ts_collisions" ->
      """WITH i AS (
        |  SELECT user_id, epoch_us(ts) AS us, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2 HAVING COUNT(*) > 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_colliding_instants,
        |  CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_events_involved,
        |  CAST(MAX(n) AS BIGINT) AS worst_pileup,
        |  CAST(SUM(CASE WHEN n_types = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same_type_instants,
        |  CAST(SUM(CASE WHEN n_types > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cross_type_instants
        |FROM i""".stripMargin,
  )
}
