package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, flagship B3 pipeline, column ops (p*), window parity (w_*), set ops (u*, o_*), sinks (k*), multimodal (m*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship E3 family (S5, P5-P9, W1-W3, A1-A2, O1-O2)
    "b3_flagship_summary" -> ((s, dir) => B3Pipeline.flagship(Tables.events(s, dir))),
    "b3_variations" -> ((s, dir) => B3Pipeline.variationsFrame(Tables.events(s, dir))),
    "b3_stats" -> ((s, dir) => B3Pipeline.stats(B3Pipeline.withVariations(B3Pipeline.prepare(Tables.events(s, dir))))),
    // Column-op battery (P1-P9)
    "p1_lit_add" -> ((s, dir) => ColumnOps.litAdd(Tables.orders(s, dir))),
    "p2_bulk_rename" -> ((s, dir) => ColumnOps.bulkRename(Tables.lineitem(s, dir))),
    "p3_guarded_rename" -> ((s, dir) => ColumnOps.guardedRename(Tables.orders(s, dir))),
    "p4_dataproc" -> ((s, dir) => ColumnOps.dataprocColumn(Tables.orders(s, dir))),
    "p5_null_filter" -> ((s, dir) => ColumnOps.nullFilter(Tables.lineitem(s, dir))),
    "p6_date_parts" -> ((s, dir) => ColumnOps.dateParts(Tables.orders(s, dir))),
    "p8_targeted_renames" -> ((s, dir) => ColumnOps.targetedRenames(Tables.lineitem(s, dir))),
    "p9_projection" -> ((s, dir) => ColumnOps.projection(Tables.part(s, dir))),
    "p10_string_funcs" -> ((s, dir) => ColumnOps.stringFuncs(Tables.part(s, dir))),
    "p11_date_funcs" -> ((s, dir) => ColumnOps.dateFuncs(Tables.orders(s, dir))),
    // Window family (W1-W3 + parity)
    "w_rank_family" -> ((s, dir) => WindowOps.rankFamily(Tables.lineitem(s, dir))),
    "w_moving_avg" -> ((s, dir) => WindowOps.movingAvg(Tables.events(s, dir))),
    // Rolling ROBUST stats: discrete lower median + quartiles over a
    // 7-row frame - the spike-resistant twin of w_moving_avg.
    "w_rolling_median" -> ((s, dir) => WindowOps.rollingMedian(Tables.events(s, dir))),
    // ratio_to_report: integer basis-point share of the nation total.
    "w_share_of_group" -> ((s, dir) =>
      WindowOps.shareOfGroup(Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    // count(distinct) over a window via the collect_list set rewrite.
    "w_rolling_distinct" -> ((s, dir) => WindowOps.rollingDistinct(Tables.events(s, dir), frame = 250)),
    "w_running_totals" -> ((s, dir) => WindowOps.runningTotals(Tables.events(s, dir))),
    "w_lead_first_last" -> ((s, dir) => WindowOps.leadFirstLast(Tables.events(s, dir))),
    "w_distribution" -> ((s, dir) => WindowOps.distributionRanks(Tables.lineitem(s, dir))),
    "p12_null_handling" -> ((s, dir) => ColumnOps.nullHandling(Tables.lineitem(s, dir))),
    // Spark side round-trips map/struct construction + extraction; the
    // oracle checks the resulting scalars straight from the flat columns.
    "p13_map_struct" -> ((s, dir) => NestedOps.mapStructFuncs(Tables.orders(s, dir))),
    // Higher-order lambda battery: filter/exists/forall/fold/indexed zip.
    "p14_hof_battery" -> ((s, dir) => ColumnOps.hofBattery(Tables.documents(s, dir))),
    "w_range_frame" -> ((s, dir) => WindowOps.rangeFrame(Tables.events(s, dir))),
    // Calendar gap-fill + forward-fill (time-series resampling): the
    // missing-trading-day repair the reference's lag-7/30 bar analytics
    // silently needs. Daily close = max_by(value, event_id) (determinism).
    "w_gap_fill" -> ((s, dir) => WindowOps.gapFill(Tables.events(s, dir))),
    "m1_multimodal_features" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      // The float features are (nibble-count / n_bytes) in float32; since
      // count ≤ n_bytes ≤ 5000 < 2^24 the counts round-trip EXACTLY through
      // float32, so round(f * n_bytes) recovers the integer histogram —
      // an engine-independent digest the DuckDB oracle reproduces from the
      // hex expansion of the utf-8 payload. Integer compare, zero FP risk.
      val media = Multimodal.fromDocuments(Tables.documents(s, dir))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("n_bytes"),
          concat_ws("|", transform(col("features"),
            f => round(f * col("n_bytes")).cast("long").cast("string")))
            .as("nibble_counts"))
        .orderBy("media_id")
    }),
    "m2_frame_sample" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      // Frame sampling is deterministic substring arithmetic over the
      // payload: frame i covers bytes [floor(n*i/k), floor(n*(i+1)/k)).
      // Emitting per-frame byte counts makes the whole multimodal
      // explode/schema path integer-exact against the oracle.
      Multimodal.sampleFrames(Multimodal.fromDocuments(Tables.documents(s, dir)), 4)
        .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
          length(col("frame_payload")).cast("int").as("frame_bytes"))
        .orderBy("media_id", "frame_idx")
    }),
    // Set ops + top-k (U1, O3/O4)
    // Perceptual dHash near-dup over binary payloads: 8×9 byte-grid
    // gradient signature, 8-band pigeonhole candidates, bit_count(xor)
    // verification — the multimodal sibling of the SimHash text path.
    "m3_phash_neardup" -> ((s, dir) =>
      Multimodal.perceptualNearDup(
        Multimodal.fromDocuments(Tables.documents(s, dir)), maxHamming = 4)),
    // CODEC-FREE video-container keyframe extraction (r10): a closed-form
    // synthetic MP4 per document is parsed back through the REAL ISO-BMFF
    // box walk (stts/stss/stsz/stsc/stco); the oracle recomputes every
    // field — including byte sums over the located mdat ranges, which
    // only match if chunk-offset expansion is exactly right.
    "m4_video_keyframes" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val mediaSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
      // (synth+parse parallelism comes from Tables.documents' layout-
      // adaptive spread — single-split local fixtures are redistributed
      // before this expensive per-item stage; see Tables.scala r11 note)
      val media = Tables.documents(s, dir).select("doc_id")
        .mapPartitions(rows => rows.map { r =>
          val id = r.getLong(0)
          Row(id, VideoContainer.syntheticMp4(id))
        })(enc)
      VideoContainer.videoKeyframes(media).orderBy("media_id", "kf_idx")
    }),
    "u1_union_by_name" -> ((s, dir) => SetOps.unionByNameRoundTrip(Tables.orders(s, dir))),
    // Schema-drift union: generations with missing columns → NULL fill.
    "u4_union_missing" -> ((s, dir) => SetOps.unionMissingColumns(Tables.orders(s, dir))),
    "u2_except" -> ((s, dir) => SetOps.exceptKeys(Tables.customer(s, dir), Tables.orders(s, dir))),
    "u3_intersect" -> ((s, dir) => SetOps.intersectKeys(Tables.customer(s, dir), Tables.orders(s, dir))),
    // Bag-semantics set ops: multiplicity differences/minima, which the
    // set forms u2/u3 cannot express (count state ∝ distinct keys).
    "u5_except_all" -> ((s, dir) => SetOps.exceptAllPriorities(Tables.orders(s, dir))),
    "u6_intersect_all" -> ((s, dir) => SetOps.intersectAllPriorities(Tables.orders(s, dir))),
    "u7_symmetric_diff" -> ((s, dir) => SetOps.symmetricDiffPriorities(Tables.orders(s, dir))),
    // Bitwise aggregate battery: bit_and/or/xor + popcount per group —
    // order-independent, map-side-combining.
    "p15_bitwise_battery" -> ((s, dir) =>
      ColumnOps.bitwiseBattery(Tables.orders(s, dir))),
    // try_* error-safety battery: null-on-failure semantics under ANSI
    // mode, identical poisoned rows in both engines.
    "p16_try_battery" -> ((s, dir) =>
      ColumnOps.tryBattery(Tables.orders(s, dir))),
    // Balanced range-partition planning from the day histogram: quantile
    // strips by integer prefix sums, fill factor vs ideal per partition.
    "k3_range_planner" -> ((s, dir) =>
      graft.sources.Sinks.rangePlanner(Tables.orders(s, dir))),
    "o_topk" -> ((s, dir) => SetOps.topK(Tables.orders(s, dir), 10)),
    // 2-D skyline (min price, max size): bucket pre-prune + exact
    // running-max pass — never the quadratic NOT-EXISTS self-join.
    "o_skyline" -> ((s, dir) => SetOps.skyline2d(Tables.part(s, dir))),
    // Longest strictly-rising/falling step runs per user (islands trick).
    "w_streaks" -> ((s, dir) => WindowOps.streaks(Tables.events(s, dir))),
    // OPTIMIZE-style bin packing over file statistics: prefix-sum
    // cuts per partition, pure metadata.
    "k1_compaction_plan" -> ((s, dir) =>
      graft.sources.Sinks.compactionPlan(Tables.lineitem(s, dir))),
    // Zone-map min/max skipping audit: files skipped, rows scanned
    // vs rows matching under a quantity predicate.
    "k2_skipping_stats" -> ((s, dir) =>
      graft.sources.Sinks.skippingStats(Tables.lineitem(s, dir))),
    // Non-associative threshold-reset fold: the voucher/budget-cap
    // recurrence no window frame can express.
    "w_reset_running_total" -> ((s, dir) =>
      TimeSeries.resetRunningTotal(Tables.events(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    // b3 family: % variation and rounded averages mirrored in EXACT scaled-
    // integer arithmetic (cents / basis points, half-away-from-zero via the
    // floor((2n+d)/2d) identity) — Spark rounds a double's shortest decimal
    // string while DuckDB rounds its binary value, so exact .5 halves
    // diverge under naive ROUND; integer math is engine-independent.
    "b3_flagship_summary" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id,
        |         CAST(ts AS DATE) AS date,
        |         EXTRACT(year FROM CAST(ts AS DATE)) AS year,
        |         EXTRACT(month FROM CAST(ts AS DATE)) AS month,
        |         value AS preco_fechamento,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         event_id AS volume_negociado
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(preco_fechamento, 7)  OVER w AS preco_7d_atras,
        |         LAG(preco_fechamento, 30) OVER w AS preco_30d_atras,
        |         LAG(cents, 7)  OVER w AS c7,
        |         LAG(cents, 30) OVER w AS c30
        |  FROM prepared
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), vv AS (
        |  SELECT *,
        |    CASE WHEN c7 IS NOT NULL AND c7 > 0 THEN
        |      CASE WHEN cents >= c7
        |        THEN CAST(floor(((cents - c7) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT)
        |        ELSE -CAST(floor(((c7 - cents) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT) END
        |    END AS q7,
        |    CASE WHEN c30 IS NOT NULL AND c30 > 0 THEN
        |      CASE WHEN cents >= c30
        |        THEN CAST(floor(((cents - c30) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT)
        |        ELSE -CAST(floor(((c30 - cents) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT) END
        |    END AS q30
        |  FROM v
        |)
        |SELECT user_id, CAST(year AS INT) AS year, CAST(month AS INT) AS month,
        |       COUNT(*) AS total_registros,
        |       CAST(SUM(volume_negociado) AS BIGINT) AS volume_total,
        |       CAST(floor((SUM(cents) * 2 + COUNT(*)) / (COUNT(*) * 2.0)) AS BIGINT) / 100.0 AS media_preco,
        |       ROUND(MIN(preco_fechamento), 2) AS menor_preco,
        |       ROUND(MAX(preco_fechamento), 2) AS maior_preco,
        |       CASE WHEN COUNT(q7) > 0 THEN
        |         CASE WHEN SUM(q7) >= 0
        |           THEN CAST(floor((SUM(q7) * 2 + COUNT(q7)) / (COUNT(q7) * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((-SUM(q7)) * 2 + COUNT(q7)) / (COUNT(q7) * 2.0)) AS BIGINT) / 100.0 END
        |       END AS media_variacao_7d,
        |       CASE WHEN COUNT(q30) > 0 THEN
        |         CASE WHEN SUM(q30) >= 0
        |           THEN CAST(floor((SUM(q30) * 2 + COUNT(q30)) / (COUNT(q30) * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((-SUM(q30)) * 2 + COUNT(q30)) / (COUNT(q30) * 2.0)) AS BIGINT) / 100.0 END
        |       END AS media_variacao_30d
        |FROM vv GROUP BY user_id, year, month
        |ORDER BY user_id, year, month""".stripMargin,
    "b3_variations" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id,
        |         CAST(ts AS DATE) AS date,
        |         CAST(EXTRACT(year FROM CAST(ts AS DATE)) AS INT) AS year,
        |         CAST(EXTRACT(month FROM CAST(ts AS DATE)) AS INT) AS month,
        |         value AS preco_fechamento,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         event_id AS volume_negociado
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(preco_fechamento, 7)  OVER w AS preco_7d_atras,
        |         LAG(preco_fechamento, 30) OVER w AS preco_30d_atras,
        |         LAG(cents, 7)  OVER w AS c7,
        |         LAG(cents, 30) OVER w AS c30
        |  FROM prepared
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |)
        |SELECT event_id, user_id, date, year, month, preco_fechamento, volume_negociado,
        |       preco_7d_atras, preco_30d_atras,
        |       CASE WHEN c7 IS NOT NULL AND c7 > 0 THEN
        |         CASE WHEN cents >= c7
        |           THEN CAST(floor(((cents - c7) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((c7 - cents) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT) / 100.0 END
        |       END AS variacao_7d,
        |       CASE WHEN c30 IS NOT NULL AND c30 > 0 THEN
        |         CASE WHEN cents >= c30
        |           THEN CAST(floor(((cents - c30) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((c30 - cents) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT) / 100.0 END
        |       END AS variacao_30d
        |FROM v ORDER BY event_id""".stripMargin,
    "b3_stats" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id, value AS preco_fechamento,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(cents, 7)  OVER w AS c7,
        |         LAG(cents, 30) OVER w AS c30
        |  FROM prepared
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), vv AS (
        |  SELECT *,
        |    CASE WHEN c7 IS NOT NULL AND c7 > 0 THEN
        |      CASE WHEN cents >= c7
        |        THEN CAST(floor(((cents - c7) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT)
        |        ELSE -CAST(floor(((c7 - cents) * 10000 * 2 + c7) / (c7 * 2.0)) AS BIGINT) END
        |    END AS q7,
        |    CASE WHEN c30 IS NOT NULL AND c30 > 0 THEN
        |      CASE WHEN cents >= c30
        |        THEN CAST(floor(((cents - c30) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT)
        |        ELSE -CAST(floor(((c30 - cents) * 10000 * 2 + c30) / (c30 * 2.0)) AS BIGINT) END
        |    END AS q30
        |  FROM v
        |)
        |SELECT user_id, COUNT(*) AS total_registros,
        |       CAST(floor((SUM(cents) * 2 + COUNT(*)) / (COUNT(*) * 2.0)) AS BIGINT) / 100.0 AS media_preco,
        |       CASE WHEN COUNT(q7) > 0 THEN
        |         CASE WHEN SUM(q7) >= 0
        |           THEN CAST(floor((SUM(q7) * 2 + COUNT(q7)) / (COUNT(q7) * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((-SUM(q7)) * 2 + COUNT(q7)) / (COUNT(q7) * 2.0)) AS BIGINT) / 100.0 END
        |       END AS media_variacao_7d,
        |       CASE WHEN COUNT(q30) > 0 THEN
        |         CASE WHEN SUM(q30) >= 0
        |           THEN CAST(floor((SUM(q30) * 2 + COUNT(q30)) / (COUNT(q30) * 2.0)) AS BIGINT) / 100.0
        |           ELSE -CAST(floor(((-SUM(q30)) * 2 + COUNT(q30)) / (COUNT(q30) * 2.0)) AS BIGINT) / 100.0 END
        |       END AS media_variacao_30d
        |FROM vv GROUP BY user_id ORDER BY user_id""".stripMargin,
    "p1_lit_add" ->
      "SELECT o_orderkey, o_totalprice, 'B3' AS source, '20240101' AS dataproc FROM orders ORDER BY o_orderkey",
    "p2_bulk_rename" ->
      "SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_quantity AS quantity, l_returnflag AS returnflag FROM lineitem ORDER BY orderkey, linenumber, quantity, l_partkey, l_suppkey, l_extendedprice",
    "p3_guarded_rename" ->
      "SELECT o_orderkey, o_orderdate AS date FROM orders ORDER BY o_orderkey",
    "p4_dataproc" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS dataproc FROM orders ORDER BY o_orderkey",
    "p5_null_filter" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_quantity IS NOT NULL AND l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice",
    "p6_date_parts" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS date, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year, CAST(EXTRACT(month FROM o_orderdate) AS INT) AS month FROM orders ORDER BY o_orderkey",
    "p8_targeted_renames" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice AS preco_fechamento, l_quantity AS volume_negociado FROM lineitem ORDER BY l_orderkey, l_linenumber, volume_negociado, l_partkey, l_suppkey, preco_fechamento",
    "p9_projection" ->
      "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part ORDER BY p_partkey",
    "p10_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lower_name, upper(p_brand) AS upper_brand,
        | replace(p_name, ' ', '-') AS hyphen_name,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | substring(p_name, 1, 5) AS name5,
        | CAST(length(p_name) AS INT) AS name_len,
        | trim(p_name) AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p11_date_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS date,
        | CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1m,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INT) AS days_to_2026,
        | CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow,
        | CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w_rank_family" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn,
        | RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rnk,
        | DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS drnk
        |FROM lineitem ORDER BY l_orderkey, rn""".stripMargin,
    "w_moving_avg" ->
      """SELECT event_id, user_id, value,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE), 2) AS msum_7,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE) / COUNT(*) OVER w7, 4) AS mavg_7
        |FROM events
        |WINDOW w7 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w_rolling_median" ->
      """SELECT event_id, user_id,
        | CAST(round(value * 100) AS BIGINT) AS cents,
        | quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) OVER w7 AS med_7,
        | quantile_disc(CAST(round(value * 100) AS BIGINT), 0.25) OVER w7 AS p25_7,
        | quantile_disc(CAST(round(value * 100) AS BIGINT), 0.75) OVER w7 AS p75_7
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w_share_of_group" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |             AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT s_suppkey, s_nationkey, CAST(cents AS BIGINT) AS cents,
        |       CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY s_nationkey)
        |            AS BIGINT) AS share_bp
        |FROM supplier JOIN r ON s_suppkey = l_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "w_rolling_distinct" ->
      """SELECT event_id, event_type,
        |  CAST(len(list_distinct(list(user_id) OVER w)) AS BIGINT)
        |    AS distinct_users
        |FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |             ROWS BETWEEN 249 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w_running_totals" ->
      """SELECT event_id, user_id, value,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wc AS DOUBLE), 2) AS running_sum,
        | COUNT(*) OVER wc AS running_n
        |FROM events
        |WINDOW wc AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w_lead_first_last" ->
      """SELECT event_id, user_id, value,
        | LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value,
        | FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_value,
        | LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
        |FROM events ORDER BY event_id""".stripMargin,
    "w_distribution" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | ROW_NUMBER() OVER u AS rn,
        | ROUND(PERCENT_RANK() OVER u, 6) AS pct_rank,
        | ROUND(CUME_DIST() OVER u, 6) AS cume,
        | NTILE(4) OVER u AS quartile
        |FROM lineitem
        |WINDOW u AS (PARTITION BY l_orderkey ORDER BY l_quantity, l_linenumber, l_partkey, l_suppkey, l_extendedprice)
        |ORDER BY l_orderkey, rn""".stripMargin,
    "p12_null_handling" ->
      """SELECT l_orderkey, l_linenumber,
        | COALESCE(NULLIF(l_returnflag, 'A'), 'FILLED') AS rf_nullable,
        | COALESCE(CASE WHEN l_returnflag = 'A' THEN NULL END, 'C') AS rf_coalesced,
        | CAST(CASE WHEN l_returnflag = 'A' THEN NULL END IS NULL AS INT) AS was_null
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    "p13_map_struct" ->
      """SELECT o_orderkey,
        | o_orderpriority AS priority,
        | o_orderstatus AS status,
        | 2 AS n_entries,
        | 'priority|status' AS keys_sorted,
        | (o_orderpriority = 'O' OR o_orderstatus = 'O') AS has_open_value,
        | o_orderpriority AS s_priority,
        | ROUND(o_totalprice, 2) AS s_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p14_hof_battery" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT) AS n_long,
        |  len(list_filter(toks, t -> regexp_matches(t, '^[A-Z]'))) > 0
        |    AS has_capitalized,
        |  len(list_filter(toks, t -> NOT (length(t) < 25))) = 0 AS all_short,
        |  CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
        |       AS BIGINT) AS total_chars,
        |  CAST(coalesce(list_sum(list_transform(toks,
        |         (t, i) -> length(t) * i)), 0) AS BIGINT) AS pos_weighted_chars
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "w_range_frame" ->
      """SELECT event_id, user_id, value,
        | COUNT(*) OVER wr AS n_in_range,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE), 2) AS sum_in_range
        |FROM events
        |WINDOW wr AS (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS date, max_by(value, event_id) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, CAST(ts AS DATE)
        |), bounds AS (
        |  SELECT user_id, min(date) AS lo, max(date) AS hi FROM daily GROUP BY user_id
        |), cal AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |      INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM bounds
        |)
        |SELECT c.user_id, c.date,
        |       LAST_VALUE(d.v IGNORE NULLS) OVER (
        |         PARTITION BY c.user_id ORDER BY c.date
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |       d.v IS NULL AS is_filled
        |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.date = d.date
        |ORDER BY c.user_id, c.date""".stripMargin,
    "m1_multimodal_features" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS INT) AS n_bytes
        |  FROM documents
        |), s AS (
        |  SELECT media_id, n_bytes,
        |    array_to_string(list_transform(range(0, CAST(n_bytes AS BIGINT)),
        |      i -> hx[2*i+1]), '') AS ns
        |  FROM h
        |)
        |SELECT media_id, n_bytes,
        |  array_to_string(list_transform(range(0,16),
        |    b -> CAST(length(ns) - length(replace(ns,
        |           substring('0123456789ABCDEF', CAST(b+1 AS INT), 1), '')) AS VARCHAR)),
        |    '|') AS nibble_counts
        |FROM s ORDER BY media_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        |  FROM documents
        |)
        |SELECT media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(floor(n * (i + 1) / 4.0) - floor(n * i / 4.0) AS INT) AS frame_bytes
        |FROM m, UNNEST([0, 1, 2, 3]) AS t(i)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "m3_phash_neardup" ->
      // the dHash signature recomputed from the hex expansion, split into
      // two 32-bit halves (a single BIGINT would need the sign bit);
      // cell j covers byte indices [ceil(j*n/72), ceil((j+1)*n/72)) — the
      // inverse image of the engine's cell(i) = i*72 div n assignment
      """WITH h AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |), bt AS (
        |  SELECT media_id, n,
        |    list_transform(range(0, n), i ->
        |      (strpos('0123456789ABCDEF', hx[CAST(2*i+1 AS INT)]) - 1) * 16 +
        |      (strpos('0123456789ABCDEF', hx[CAST(2*i+2 AS INT)]) - 1)) AS bs
        |  FROM h
        |), cl AS (
        |  SELECT media_id,
        |    list_transform(range(0, 72), j ->
        |      COALESCE(list_sum(bs[CAST((j*n+71)//72+1 AS INT)
        |                          : CAST(((j+1)*n+71)//72 AS INT)]), 0)) AS cs
        |  FROM bt
        |), sg AS (
        |  SELECT media_id,
        |    CAST(list_sum(list_transform(range(0, 32), k ->
        |      CASE WHEN cs[CAST((k//8)*9+(k%8)+1 AS INT)]
        |              > cs[CAST((k//8)*9+(k%8)+2 AS INT)]
        |           THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE 0 END))
        |      AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(32, 64), k ->
        |      CASE WHEN cs[CAST((k//8)*9+(k%8)+1 AS INT)]
        |              > cs[CAST((k//8)*9+(k%8)+2 AS INT)]
        |           THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INT) ELSE 0 END))
        |      AS BIGINT) AS hi
        |  FROM cl
        |)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        |            AS BIGINT) AS hamming
        |FROM sg a JOIN sg b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 4
        |ORDER BY media_a, media_b""".stripMargin,
    // the synthetic container's closed-form parameters recomputed from
    // doc_id; byte_sum re-derives the per-byte fill pattern over each
    // keyframe's sample range — the parser must locate the identical
    // range inside mdat for the sums to agree
    "m4_video_keyframes" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id,
        |         16 + doc_id % 17 AS n,
        |         4 + doc_id % 3 AS g,
        |         512 + (doc_id % 5) * 128 AS delta,
        |         9000 + (doc_id % 4) * 3000 AS ts
        |  FROM documents
        |), u AS (
        |  SELECT media_id, n, g, delta, ts,
        |         unnest(generate_series(1, n)) AS i
        |  FROM p
        |), s AS (
        |  SELECT * FROM u WHERE (i - 1) % g = 0
        |)
        |SELECT media_id,
        |  CAST((i - 1) // g AS INT) AS kf_idx,
        |  CAST(i AS INT) AS sample_idx,
        |  CAST(n AS INT) AS n_samples,
        |  CAST(ts AS BIGINT) AS timescale,
        |  CAST(n * delta AS BIGINT) AS duration,
        |  'mp4v' AS codec,
        |  CAST((i - 1) * delta AS BIGINT) AS t_units,
        |  CAST(64 + (media_id * 131 + i * 17) % 64 AS BIGINT) AS sample_size,
        |  CAST(list_sum(list_transform(
        |    range(0, 64 + (media_id * 131 + i * 17) % 64),
        |    j -> (media_id * 7 + i * 13 + j * 11) % 251)) AS BIGINT) AS byte_sum
        |FROM s
        |ORDER BY media_id, kf_idx""".stripMargin,
    "u1_union_by_name" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey",
    "u4_union_missing" ->
      """SELECT * FROM (
        |  (SELECT o_orderkey, o_orderstatus FROM orders)
        |  UNION ALL BY NAME
        |  (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000)
        |)
        |ORDER BY o_orderkey, o_orderstatus NULLS FIRST""".stripMargin,
    "u2_except" ->
      "SELECT c_custkey AS key FROM customer EXCEPT SELECT o_custkey AS key FROM orders ORDER BY key",
    "u3_intersect" ->
      "SELECT c_custkey AS key FROM customer INTERSECT SELECT o_custkey AS key FROM orders ORDER BY key",
    "u5_except_all" ->
      """SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT ALL
        |SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_orderpriority""".stripMargin,
    "u6_intersect_all" ->
      """SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
        |INTERSECT ALL
        |SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_orderpriority""".stripMargin,
    // independent formulation: the textbook two-EXCEPT-ALL symmetric
    // difference, re-aggregated to (key, side, multiplicity) — proves the
    // engine's one-pass count-difference identity
    "u7_symmetric_diff" ->
      """SELECT o_orderpriority, surplus_side, count(*) AS multiplicity FROM (
        |  SELECT o_orderpriority, '1996' AS surplus_side FROM (
        |    SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
        |    EXCEPT ALL
        |    SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997) a
        |  UNION ALL
        |  SELECT o_orderpriority, '1997' AS surplus_side FROM (
        |    SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997
        |    EXCEPT ALL
        |    SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996) b) u
        |GROUP BY o_orderpriority, surplus_side
        |ORDER BY o_orderpriority""".stripMargin,
    "p15_bitwise_battery" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(bit_and(o_orderkey) AS BIGINT) AS band,
        |  CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
        |  CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor,
        |  CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS sum_popcount,
        |  CAST(MAX(bit_count(o_orderkey)) AS BIGINT) AS max_popcount
        |FROM orders WHERE o_orderkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p16_try_battery" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |    TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit,
        |    TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
        |             ELSE CAST(o_orderdate AS VARCHAR) END AS DATE)
        |      AS maybe_date,
        |    FLOOR(CAST(round(o_totalprice * 100) AS BIGINT)
        |          / NULLIF(o_orderkey % 3, 0)) AS div_floor
        |  FROM orders
        |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND o_orderdate IS NOT NULL
        |)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(prio_digit) AS BIGINT) AS sum_digit,
        |  CAST(SUM(CASE WHEN maybe_date IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_bad_dates,
        |  CAST(SUM(CASE WHEN div_floor IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_div_null,
        |  CAST(SUM(CAST(div_floor AS BIGINT)) AS BIGINT) AS sum_div_floor
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "k3_range_planner" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        |), x AS (
        |  SELECT day, c,
        |    SUM(c) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER () AS total
        |  FROM daily
        |)
        |SELECT CAST((cum - 1) * 8 // total AS BIGINT) AS part,
        |  MIN(day) AS day_lo, MAX(day) AS day_hi,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(SUM(c) * 8 * 1000 // MAX(total) AS BIGINT) AS fill_permille
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "o_topk" ->
      "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "o_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
        |         CAST(p_size AS BIGINT) AS size
        |  FROM part
        |)
        |SELECT p_partkey, cents, size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.cents <= a.cents AND b.size >= a.size
        |    AND (b.cents < a.cents OR b.size > a.size)
        |)
        |ORDER BY p_partkey""".stripMargin,
    "w_streaks" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
        |), f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN cents > lag(cents) OVER w THEN 1 ELSE 0 END AS up,
        |    CASE WHEN cents < lag(cents) OVER w THEN 1 ELSE 0 END AS dn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), r AS (
        |  SELECT user_id, up, dn,
        |    SUM(1 - up) OVER w2 AS up_run,
        |    SUM(1 - dn) OVER w2 AS dn_run
        |  FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id
        |                       ROWS UNBOUNDED PRECEDING)
        |), ur AS (
        |  SELECT user_id, up_run, SUM(up) AS len, COUNT(*) AS n
        |  FROM r GROUP BY 1, 2
        |), dr AS (
        |  SELECT user_id, dn_run, SUM(dn) AS len FROM r GROUP BY 1, 2
        |), u AS (
        |  SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
        |         CAST(MAX(len) AS BIGINT) AS longest_up
        |  FROM ur GROUP BY 1
        |), dd AS (
        |  SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_down
        |  FROM dr GROUP BY 1
        |)
        |SELECT u.user_id, n_events, longest_up, longest_down
        |FROM u JOIN dd USING (user_id) ORDER BY user_id""".stripMargin,
    "k1_compaction_plan" ->
      """WITH f AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |         l_suppkey AS file_key, CAST(COUNT(*) AS BIGINT) AS rows
        |  FROM lineitem
        |  WHERE l_shipdate IS NOT NULL AND l_suppkey IS NOT NULL
        |  GROUP BY 1, 2
        |), b AS (
        |  SELECT month, file_key, rows,
        |    COALESCE(SUM(rows) OVER (PARTITION BY month ORDER BY file_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 200
        |      AS bin
        |  FROM f
        |), bins AS (
        |  SELECT month, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        |         CAST(SUM(rows) AS BIGINT) AS bin_rows
        |  FROM b GROUP BY 1, 2
        |)
        |SELECT month, CAST(SUM(n_files) AS BIGINT) AS n_files,
        |  CAST(SUM(bin_rows) AS BIGINT) AS total_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(MAX(bin_rows) AS BIGINT) AS max_bin_rows,
        |  CAST(SUM(CASE WHEN bin_rows * 2 < 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_underfilled
        |FROM bins GROUP BY 1 ORDER BY 1""".stripMargin,
    "k2_skipping_stats" ->
      """WITH f AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |    l_suppkey AS file_key, CAST(COUNT(*) AS BIGINT) AS rows,
        |    CAST(MAX(l_quantity) AS BIGINT) AS max_q,
        |    CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matching
        |  FROM lineitem
        |  WHERE l_shipdate IS NOT NULL AND l_suppkey IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(CASE WHEN max_q <= 45 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_skipped,
        |  CAST(SUM(rows) AS BIGINT) AS total_rows,
        |  CAST(SUM(CASE WHEN max_q > 45 THEN rows ELSE 0 END) AS BIGINT)
        |    AS rows_scanned,
        |  CAST(SUM(matching) AS BIGINT) AS rows_matching
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // Recursive-CTE step-fold (the g1 oracle pattern): all users advance
    // in lockstep one purchase per round. Deliberately NOT list_reduce —
    // DuckDB 1.0.0's lambda plane miscomputes it on multi-row vectors
    // (one of 15 sf0.001 users came back wrong; correct when run alone).
    "w_reset_running_total" ->
      """WITH RECURSIVE p AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS i
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type = 'purchase' AND value IS NOT NULL
        |), n AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
        |  FROM p GROUP BY 1
        |), st AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS i,
        |    CAST(0 AS BIGINT) AS resets, CAST(0 AS BIGINT) AS run
        |  FROM n
        |  UNION ALL
        |  SELECT st.user_id, st.i + 1,
        |    CASE WHEN st.run + p.cents >= 10000
        |      THEN st.resets + 1 ELSE st.resets END,
        |    CASE WHEN st.run + p.cents >= 10000
        |      THEN CAST(0 AS BIGINT) ELSE st.run + p.cents END
        |  FROM st JOIN p ON p.user_id = st.user_id AND p.i = st.i + 1
        |)
        |SELECT user_id, n_purchases,
        |  resets AS n_vouchers, run AS residual_cents
        |FROM st JOIN n USING (user_id) WHERE st.i = n.n_purchases
        |ORDER BY user_id""".stripMargin,
  )
}
