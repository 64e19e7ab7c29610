package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure `(SparkSession, sfDir) => DataFrame`
  * over the fixture tables; [[oracleSql]] carries the DuckDB-equivalent SQL
  * for the driver's hash compare. Column names are aliased identically on
  * both sides, and every query ends in a total `ORDER BY` over a unique key
  * set so the row stream is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    B3Pipeline.flagship(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // Correlated scalar + EXISTS subqueries (Catalyst decorrelates both to
    // aggregate/semi joins): orders strictly above their customer's mean
    // order value, integer cross-multiplied so no FP average compares.
    "e9_correlated_sql" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_sqlv")
      s.sql("""SELECT o_orderkey, o_custkey,
              |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              |FROM orders_sqlv o
              |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
              |      (SELECT COUNT(*) FROM orders_sqlv o2
              |       WHERE o2.o_custkey = o.o_custkey)
              |    > (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
              |       FROM orders_sqlv o2 WHERE o2.o_custkey = o.o_custkey)
              |  AND EXISTS (SELECT 1 FROM orders_sqlv o3
              |              WHERE o3.o_custkey = o.o_custkey
              |                AND o3.o_orderstatus = 'F')
              |ORDER BY o_orderkey""".stripMargin)
    }),
    // The streaming tumbling-window aggregate run as a batch query: same
    // window()/groupBy spec as EventStream.windowedCounts (watermark is a
    // batch no-op), integer-cents measures so the oracle can hash it —
    // putting the stream aggregation's SEMANTICS under the DuckDB gate.
    "e10_tumbling_window" -> ((s, dir) =>
      graft.streaming.EventStream.windowedCountsExact(Tables.events(s, dir))
        .orderBy("window_start_s", "event_type")),
    // HLL sketch values aren't cross-engine comparable; the registered query
    // compares the 3·rsd accuracy CONTRACT instead (oracle emits TRUE).
    "a6_approx_distinct" -> ((s, dir) => Aggregates.approxDistinctChecked(Tables.lineitem(s, dir))),
    "a7_cube" -> ((s, dir) => Aggregates.cubeSummary(Tables.lineitem(s, dir))),
    "a8_percentiles" -> ((s, dir) => Aggregates.percentiles(Tables.lineitem(s, dir))),
    "a9_pivot" -> ((s, dir) => Aggregates.pivotSummary(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    "a10_collect" -> ((s, dir) => Aggregates.collectAggregates(Tables.lineitem(s, dir))),
    "t5_explode_tokens" -> ((s, dir) => TextOps.explodeTokens(Tables.documents(s, dir))),
    "t6_array_ops" -> ((s, dir) => TextOps.arrayOps(Tables.documents(s, dir))),
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
    "p12_null_handling" -> ((s, dir) => ColumnOps.nullHandling(Tables.lineitem(s, dir))),
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
    // LLM-pipeline tier: dedup / text analysis / similarity search
    "d1_exact_dedup" -> ((s, dir) => Dedup.exactDedup(Tables.documents(s, dir))),
    "d2_dup_stats" -> ((s, dir) => Dedup.dupStats(Tables.documents(s, dir))),
    // materializeCandidates: the candidate subtree feeds both the semi-join
    // pruning and the pair join — materializing halves the dominant stage.
    // (The threshold-0.5 hash-seeded variant retired in r9: rows-only at
    // the driver gate; DedupSimilaritySpec still exercises the operator,
    // and d22_minhash_oracle is its hash-green md5-derandomized twin.)
    // Oracle-proven fuzzy dedup: at threshold 0.9 the 8×4 banding recall is
    // 1-(1-0.9^4)^8 ≈ 0.9998, so LSH output equals DuckDB's exact all-pairs
    // 3-gram Jaccard — promoting the flagship LLM operator from rows-only
    // to hash-compared. That recall is PROBABILISTIC (per-pair, fixed
    // seed → deterministic per dataset, but a qualifying pair CAN miss all
    // bands); DedupSimilaritySpec's "d3b guard" pins the residual to zero
    // on the current fixture by asserting banded == exact all-pairs.
    "d3b_minhash_highsim" -> ((s, dir) => Dedup.nearDupPairs(Tables.documents(s, dir), threshold = 0.9, materializeCandidates = true)),
    // maxHamming = 3 → 16-bit chunks, 65k bucket values per chunk: bucket
    // occupancy stays sublinear in corpus size (maxHamming = 8 would leave
    // ~7-bit chunks whose buckets grow linearly — quadratic verify at 100×).
    // (Hash-seeded simhashPairs/simhashPairsCombination registry entries
    // retired in r9 — rows-only at the gate; DedupSimilaritySpec keeps the
    // operators pinned and d23_simhash_oracle/d4c are the hash-green twins.)
    // SimHash banding completeness/soundness vs brute force, driver-
    // witnessed as booleans (DuckDB can't compute SimHash; d5b pattern).
    "d4c_simhash_contract" -> ((s, dir) => Dedup.simhashContract(Tables.documents(s, dir), maxHamming = 3)),
    // Incremental corpus maintenance: the (nibble >= 12) batch deduped
    // against the (nibble < 12) corpus through its precomputed band
    // index — corpus text touched only for candidate docs. Threshold 0.9
    // -> banded recall ~1 (d3b argument), so exact cross-set Jaccard is
    // the oracle.
    "d10_incremental_dedup" -> ((s, dir) => {
      val nb = TextOps.hexNibble("doc_id")
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(nb < 12)
      val incoming = docs.filter(nb >= 12)
      Dedup.incrementalNearDups(Dedup.bandIndex(corpus), corpus, incoming, 0.9,
        materializeCandidates = true)
    }),
    // (Hash-seeded corpusSignatures registry entry retired in r9 —
    // rows-only at the gate; d5b is its hash-green md5-derandomized twin
    // and DedupSimilaritySpec keeps the operator pinned.)
    // The corpus-signature VALUES are hash-seeded (rows-only legacy), but the
    // custom Aggregator's merge correctness is driver-witnessable as a
    // CONTRACT (a6 pattern): the signature must be partitioning-invariant
    // — computing it over a 7-way hash repartition must merge partial
    // states into the identical signature. A broken merge() flips the
    // boolean and hash-mismatches the TRUE-emitting oracle.
    // Signature-maintenance contract: stored ⊕ batch signature merge
    // (elementwise min) equals the full-corpus signatures — the INSERT
    // path of signature maintenance (e8b covers the delete path).
    "d12_signature_merge" -> ((s, dir) =>
      Dedup.signatureMergeContract(Tables.documents(s, dir))),
    "d5b_signature_contract" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat_ws}
      def sigs(df: org.apache.spark.sql.DataFrame) =
        Dedup.corpusSignatures(df).withColumn("sig",
          concat_ws("|", col("corpus_signature").cast("array<string>")))
          .select(col("lang"), col("sig"))
      val docs = Tables.documents(s, dir)
      sigs(docs).alias("a")
        .join(sigs(docs.repartition(7, col("doc_id"))).alias("b"), "lang")
        .select(col("lang"),
          (col("a.sig") === col("b.sig")).as("partition_invariant"))
        .orderBy("lang")
    }),
    "d6_curated" -> ((s, dir) => Dedup.curatedCorpus(Tables.documents(s, dir))),
    // Typed Dataset[T] surface: the SAME curation gate written against
    // case classes (compile-time field safety, reduceGroups partial agg).
    // Hash-compared against the SAME oracle SQL as d6_curated — the
    // referee that the typed and untyped paths compute identically.
    "d6b_curated_typed" -> ((s, dir) => {
      import s.implicits._
      TypedOps.curatedCorpusTyped(
        Tables.documents(s, dir).as[TypedOps.Doc]).toDF()
    }),
    // Transitive closure of the near-dup relation: LSH pairs at 0.9 (the
    // d3b-proven edge set) → alternating large-star/small-star connected
    // components → every doc labeled with its cluster's min id. Oracle:
    // the same edges via exact all-pairs Jaccard + a recursive-CTE
    // min-label closure.
    "d7_dup_clusters" -> ((s, dir) => Dedup.dupClusters(Tables.documents(s, dir), threshold = 0.9)),
    // Capstone: end-to-end training-data prep — sample → quality/lang
    // gate → exact dedup → near-dup cluster representatives → token-
    // budget packing, each stage individually oracle-proven (t7/d6/d1/
    // d3b+d7/t10), the composition oracle-checked as one query.
    "d8_training_prep" -> ((s, dir) => TrainingPipeline.trainingPrep(Tables.documents(s, dir))),
    // Benchmark decontamination: training docs sharing any 5-token gram
    // with the held-out (nibble-15) eval split, with distinct-hit counts.
    "d9_decontaminate" -> ((s, dir) => Decontam.contaminationReport(Tables.documents(s, dir))),
    // Same report through the mergeable-bloom prefilter (the 100 TB shape:
    // eval grams -> ONE bloom row, scan-side might_contain, exact verify
    // on the sliver). Output must be byte-identical to d9 -> same oracle.
    "d9b_decontaminate_bloom" -> ((s, dir) => Decontam.contaminationReportBloom(Tables.documents(s, dir))),
    // FUZZY decontamination: train docs near-duplicating an eval doc at
    // 3-gram Jaccard >= 0.5, graded per pair. Exact but never all-pairs:
    // the gram equi-join carries set sizes, so Jaccard falls out of the
    // collision counts with no second shingle pass.
    "d14_fuzzy_decontam" -> ((s, dir) => Decontam.fuzzyContaminationReport(Tables.documents(s, dir))),
    // SemDeDup: embedding near-dup removal within nearest-centroid
    // clusters (pairwise cosine bounded by cluster size, never all-pairs).
    "d15_semdedup" -> ((s, dir) => Similarity.semDedup(Tables.embeddings(s, dir), 0.35, 64)),
    // Integer-exact 3-iteration PageRank over the customer↔supplier graph.
    "g1_pagerank" -> ((s, dir) => GraphOps.supplierRank(
      Tables.orders(s, dir), Tables.lineitem(s, dir), 25, 3)),
    // Degree-ordered triangle count over the part co-purchase graph
    // (wedges only between out-neighbors — O(m^1.5), no skewed reducer).
    // Registered with the standard cost bounds: baskets capped at 8
    // distinct parts and a deterministic half-vertex sample (p % 2 = 0) —
    // the sf0.1 co-purchase graph is dense (~1.2M edges / 20k parts) and
    // the full wedge volume is intrinsic, not a plan defect. The oracle
    // applies the identical predicates.
    "g2_triangles" -> ((s, dir) =>
      GraphOps.triangleCount(Tables.lineitem(s, dir), materialize = true,
        maxBasket = 8, vertexMod = 2L)),
    // Product families: connected components over the support>=2
    // co-purchase graph (large-star/small-star, per-node min-id labels).
    "g3_components" -> ((s, dir) =>
      GraphOps.coPurchaseComponents(Tables.lineitem(s, dir), minSupport = 2L)),
    // k-core membership (k=2) over the same graph: iterative peel to the
    // fixpoint — structural embeddedness that degree alone can't express.
    "g5_kcore" -> ((s, dir) => GraphOps.kCore(Tables.lineitem(s, dir))),
    // Weighted companion of g4: min-cost <=3-edge walk from the Brand#11
    // seeds, integer costs 10^6 div support, fixed-round Bellman-Ford.
    "g6_cheapest_path" -> ((s, dir) =>
      GraphOps.cheapestPath(Tables.lineitem(s, dir), Tables.part(s, dir))),
    // Quality-aware survivor per near-dup cluster (best doc, not min id).
    "d16_cluster_reps" -> ((s, dir) => Dedup.clusterRepresentatives(Tables.documents(s, dir), 0.9)),
    // Gopher-style repetition quality: per-doc 2-gram totals / distincts /
    // top-count / duplicated instances, computed shuffle-free per row.
    "t14_repetition" -> ((s, dir) => TextOps.repetitionStats(Tables.documents(s, dir))),
    // Misra-Gries frequent items: constant-memory top terms per language
    // (exact at capacity 64 > fixture vocab -> oracle-proven; the sketch
    // bound contract is unit-tested).
    "t15_heavy_hitters" -> ((s, dir) => TextOps.heavyHitterTerms(Tables.documents(s, dir))),
    // Capstone + decontamination: the d8 pipeline with the d9 stage wired
    // between the quality gate and dedup (eval split = nibble 15, disjoint
    // from the nibble<12 training sample).
    "d8b_training_prep_decon" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TrainingPipeline.trainingPrep(docs,
        evalSet = Some(docs.filter(TextOps.hexNibble("doc_id") === 15)))
    }),
    "t1_token_stats" -> ((s, dir) => TextOps.tokenStats(Tables.documents(s, dir))),
    "t2_lang_id" -> ((s, dir) => TextOps.langId(Tables.documents(s, dir))),
    // Label-vs-prediction agreement audit over the lang-ID heuristic.
    "t19_lang_confusion" -> ((s, dir) => TextOps.langConfusion(Tables.documents(s, dir))),
    "t3_fingerprints" -> ((s, dir) => TextOps.fingerprints(Tables.documents(s, dir))),
    "t4_lang_stats" -> ((s, dir) => TextOps.langStats(Tables.documents(s, dir))),
    "e1_json_extract" -> ((s, dir) => TextOps.jsonExtract(Tables.events(s, dir))),
    // Vocabulary statistics: document frequency per (lang, term), top-10
    // per language — the inverted-index/vocab-build shape, all-integer.
    "t9_vocab_topk" -> ((s, dir) => TextOps.termDocFrequency(Tables.documents(s, dir), 10)),
    // Token-budget sequence chunking: contiguous fill per language stream,
    // chunk_id from a keyed window running sum — training-batch prep.
    "t10_pack_chunks" -> ((s, dir) => TextOps.packSequences(Tables.documents(s, dir), 512)),
    // Cross-document boilerplate lexicon: 8-grams shared by >= 3 docs.
    "t11_boilerplate_ngrams" -> ((s, dir) => TextOps.repeatedNgrams(Tables.documents(s, dir), 8, 3)),
    "t21_boilerplate_strip" -> ((s, dir) => TextOps.stripBoilerplate(Tables.documents(s, dir), 8, 3)),
    // Maximal cross-doc repeated token spans (exact-substring-dup report):
    // covered positions merged gaps-and-islands style; rows ∝ spans.
    "t24_repeated_spans" -> ((s, dir) => TextOps.repeatedSpans(Tables.documents(s, dir), 8, 3)),
    // PII scan: per-row email/phone/IPv4 match counts over synthesized
    // ticket text (fixture corpus is PII-free); row-local, scan-bound.
    "t25_pii_scan" -> ((s, dir) => TextOps.piiScan(
      Tables.customer(s, dir).selectExpr("c_custkey", TextOps.piiTicketSql + " AS ticket"),
      "c_custkey", "ticket")),
    // PII scrub contract: typed-placeholder replacement, byte-compared
    // against DuckDB's RE2 scrub; residual_pii pinned to 0 per row.
    // Distributed BPE tokenizer training: top-5 merges over the corpus
    // word-frequency table, greedy left-to-right semantics replayable in
    // SQL (doubled-separator replace trick) - integer counts throughout.
    "t26_bpe_merges" -> ((s, dir) => TextOps.bpeMerges(Tables.documents(s, dir), 5)),
    // PMI collocations: integer-rational association score, min-support
    // gated - the phrase-mining step of vocabulary induction.
    "t28_collocations" -> ((s, dir) => TextOps.collocations(Tables.documents(s, dir))),
    // BPE serving: vocab-sized segmentation broadcast into the corpus
    // scan; per-doc word/token counts + characters covered by merges.
    "t27_bpe_encode" -> ((s, dir) => TextOps.bpeEncode(Tables.documents(s, dir), 5)),
    "t25b_pii_scrub" -> ((s, dir) => TextOps.piiScrub(
      Tables.customer(s, dir).selectExpr("c_custkey", TextOps.piiTicketSql + " AS ticket"),
      "c_custkey", "ticket")),
    // Integer-exact BM25 (rational idf variant): top-20 docs for a
    // three-term bag-of-words query.
    "t22_bm25" -> ((s, dir) => TextOps.bm25Rank(Tables.documents(s, dir),
      Seq("spark", "vector", "merge"), 20)),
    // CCNet-style unigram-LM quality score, trained on the nb<12 slice.
    "t23_lm_quality" -> ((s, dir) => TextOps.lmQualityScore(Tables.documents(s, dir), 12)),
    // Deterministic content-addressed sampling (reproducible pipeline
    // subsetting): keep iff first md5(doc_id) nibble < 6 → expected 6/16.
    "t7_hash_sample" -> ((s, dir) => TextOps.deterministicSample(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"), "doc_id", 6)),
    // Stratified variant: downsample the over-represented language
    // (en → 6/16) while keeping the tail at 12/16 — a map-side filter,
    // no shuffle.
    "t8_stratified_sample" -> ((s, dir) => TextOps.stratifiedSample(
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars"), "doc_id", "lang",
      Map("en" -> 6), defaultSixteenths = 12)),
    // Per-document keyword extraction, tf-idf-shaped with integer-exact
    // rational scoring (tf·10⁶ ÷ df floor division — FP idf logs differ
    // across engines in the last ulp; floor division doesn't).
    "t12_doc_keywords" -> ((s, dir) => TextOps.docKeywords(Tables.documents(s, dir), 3)),
    // SCD Type-2 merge (versioned dimension upsert): a deterministic CDC
    // batch derived from md5-nibble buckets of the customer key exercises
    // close+insert, no-op, and plain-insert branches in one merge pass.
    "e2_scd2_merge" -> ((s, dir) => MergeOps.scd2Demo(Tables.customer(s, dir))),
    // Point-in-time SCD2 resolution: orders joined to the dimension AS OF
    // t=0 and t=1 side by side. Each PIT side collapses to one version
    // per key BEFORE the fact join (map-side filter), so both joins stay
    // plain equi-joins.
    "e11_pit_lookup" -> ((s, dir) => MergeOps.pitLookupDemo(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    // CDC compaction: latest row per user by monotone event_id (ranked by
    // id, not the ns timestamp — sub-µs ties rank nondeterministically
    // after precision conversion). One row per key → user_id sort is total.
    "e3_latest_per_key" -> ((s, dir) => MergeOps.latestByKey(
      Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
      "user_id", "event_id").orderBy("user_id")),
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
    // Incremental aggregate maintenance contract: snapshot ⊕ delta must
    // equal the one-shot aggregate, exactly (integer cents state).
    "e4_incremental_agg" -> ((s, dir) => Quality.incrementalAggContract(Tables.events(s, dir))),
    // Batch sessionization: inactivity-gap session carving per user (the
    // batch analog of the streaming session_window), integer-µs endpoints.
    "e6_sessionize" -> ((s, dir) => Sessions.sessionize(Tables.events(s, dir))),
    // E4 SQL front door, oracle-proven: the Athena-style consumption SQL
    // (reference b3_transform.py:367-380 shape) runs VERBATIM through
    // spark.sql over a registered view — the text-SQL path a reference
    // user migrates to, not just the DataFrame API. Money stays in cents.
    "e5_sql_front_door" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_sqlv")
      s.sql("""SELECT user_id,
              |       year(to_date(ts)) AS year, month(to_date(ts)) AS month,
              |       COUNT(*) AS total_registros,
              |       SUM(event_id) AS volume_total,
              |       SUM(CAST(round(value * 100) AS BIGINT)) AS total_cents
              |FROM events_sqlv
              |WHERE value IS NOT NULL AND ts IS NOT NULL
              |  AND user_id IS NOT NULL AND event_id IS NOT NULL
              |GROUP BY user_id, year(to_date(ts)), month(to_date(ts))
              |ORDER BY user_id, year, month""".stripMargin)
    }),
    // Positional-index phrase search: postings filtered to the two query
    // terms BEFORE the adjacency equi-join — index-sized work, not corpus.
    "t13_phrase_search" -> ((s, dir) => TextOps.phraseSearch(Tables.documents(s, dir), "order", "fast")),
    "s1_cosine_topk" -> ((s, dir) => Similarity.bruteForceTopK(Tables.embeddings(s, dir), 0L, 20)),
    // (Hash-seeded nearNeighborPairs registry entry retired in r9 — LSH
    // bucket membership is hash-seeded so it could only ever be rows-only
    // at the gate. The operator stays spec-pinned; s17_ann_oracle is the
    // hash-green LCG-derandomized ANN twin and s3_knn_join the exact
    // oracle-proven equivalence evidence.)
    // Exact-integer per-label centroids via a mergeable Aggregator (one
    // (dim+1)-long state per group-partition, no dim-fold explode shuffle).
    "s4_centroids" -> ((s, dir) => Similarity.labelCentroids(Tables.embeddings(s, dir))),
    // IVF coarse-assign / classify-by-prototype: argmin over exact
    // integer squared L2 to the broadcast centroid table.
    "s5_nearest_centroid" -> ((s, dir) => Similarity.nearestCentroid(Tables.embeddings(s, dir))),
    // Exact k-NN JOIN (batch similarity search): top-5 neighbors for each
    // of 5 query vectors, broadcast query side, one corpus scan.
    "s3_knn_join" -> ((s, dir) => Similarity.knnJoin(Tables.embeddings(s, dir), Seq(0L, 1L, 2L, 3L, 4L), 5)),
    // Hard-negative mining: per anchor, cosine ranks 6..15 — past the
    // top-5 positive block, still similar enough to be informative.
    // Same broadcast + WindowGroupLimit shape as s3.
    "s10_hard_negatives" -> ((s, dir) => Similarity.hardNegatives(Tables.embeddings(s, dir), Seq(0L, 1L, 2L, 3L, 4L), 5, 10)),
    // Integer-exact fixed-iteration Lloyd k-means: md5-order seeding,
    // micro-unit squared-L2, truncating-division centroid updates —
    // the oracle-checkable quantizer trainer (MLlib's is FP-seeded).
    "s11_kmeans" -> ((s, dir) => IvfIndex.kmeansExact(Tables.embeddings(s, dir), 8, 2)),
    // Uint8 scalar quantization (ANN index compression): integer-exact
    // codes + per-vector worst-case reconstruction error, scan-bound.
    "s6_quantize" -> ((s, dir) => Similarity.quantizeEmbeddings(Tables.embeddings(s, dir))),
    // Embedding drift monitor: candidate-half vs reference-half mean
    // distance to the reference centroids, exact-integer per-mille.
    "s7_embedding_drift" -> ((s, dir) => Similarity.embeddingDrift(Tables.embeddings(s, dir))),
    // ANN recall contract: the quantized IVF serving path recovers at
    // least `threshold` of the exact s3 k-NN — driver-witnessed TRUE
    // (d4c pattern; makes s2's rows-only status moot).
    "s8_ann_contract" -> ((s, dir) =>
      IvfIndex.annRecallContract(Tables.embeddings(s, dir),
        queryIds = 0L until 16L, k = 10)),
    // Index MAINTENANCE contract: frozen-centroid incremental append of a
    // content-addressed batch equals a rebuild from the full set — the
    // insert mirror of e8b's delete (d5b pattern).
    "s9_append_contract" -> ((s, dir) =>
      IvfIndex.appendContract(Tables.embeddings(s, dir))),
    // Product-quantization contract: guaranteed codebook-size error
    // monotonicity + shortlist-then-exact-rerank recall at 64 bits/vector
    // vs 2048 (recall 0.83/0.64 measured at sf0.01/0.1, threshold 0.5).
    "s12_pq_contract" -> ((s, dir) =>
      IvfIndex.pqContract(Tables.embeddings(s, dir), queryIds = 0L until 16L,
        m = 16, kSub = 16, k = 10, threshold = 0.5, shortlist = 100)),
    // Dimension-truncated candidate scan + full-precision rerank
    // (Matryoshka-style serving; recall 0.86/0.70 measured at sf0.01/0.1).
    "s13_truncated_scan" -> ((s, dir) =>
      IvfIndex.truncatedRecallContract(Tables.embeddings(s, dir),
        queryIds = 0L until 16L, keepDims = 32, k = 10, shortlist = 100)),
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
    "u1_union_by_name" -> ((s, dir) => SetOps.unionByNameRoundTrip(Tables.orders(s, dir))),
    // Schema-drift union: generations with missing columns → NULL fill.
    "u4_union_missing" -> ((s, dir) => SetOps.unionMissingColumns(Tables.orders(s, dir))),
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
    // Right-to-erasure audit: per-subject rows-removed proof, including
    // never-existed subjects (found = false).
    "e8_erasure_audit" -> ((s, dir) => Quality.erasureAuditDemo(Tables.events(s, dir))),
    // Sequential funnel: view -> click-at-or-after -> purchase-at-or-after,
    // chained window minima over ONE user exchange; order matters.
    "e12_funnel" -> ((s, dir) => Sessions.funnel(Tables.events(s, dir))),
    // Last-touch attribution: purchases tied to the most recent click
    // within 1h via the merged-stream as-of carry (one keyed exchange).
    "e17_attribution" -> ((s, dir) => Sessions.lastTouchAttribution(Tables.events(s, dir))),
    // Cohort retention: week-of-first-event cohorts x week offset, all
    // per-user work on ONE user_id exchange (collect_set, not
    // distinct+self-join); anchor-day arithmetic, engine-independent.
    "e13_cohort_retention" -> ((s, dir) => Sessions.cohortRetention(Tables.events(s, dir))),
    // Sliding 30-min/10-min windows through Spark's NATIVE window()
    // generator (the op streaming time-windows compile to); oracle
    // re-derives the epoch-aligned starts with integer arithmetic.
    "e14_sliding_window" -> ((s, dir) => Sessions.slidingWindowStats(Tables.events(s, dir))),
    // NATIVE session_window (boundary-INCLUSIVE: a gap of exactly 1h
    // merges — spec-witnessed); oracle re-derives boundaries
    // gaps-and-islands-style with > in integer µs. One user_id exchange
    // + in-partition session merge.
    "e15_session_window" -> ((s, dir) => Sessions.nativeSessionWindows(Tables.events(s, dir))),
    // Erasure PROPAGATION contract: incremental repair of the derived
    // artifacts (band index, corpus signatures, IVF lists) equals each
    // artifact rebuilt from the erased corpus, and no erased key survives
    // — all booleans driver-witnessed TRUE (d4c pattern).
    "e8b_erasure_propagation" -> ((s, dir) =>
      Erasure.erasureContract(Tables.documents(s, dir), Tables.embeddings(s, dir))),
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
    // Exact weighted median (quantity-weighted price) per return flag:
    // corpus collapses to (group, cents) cells, partition-keyed running
    // sum, 2*cum >= total lower-median pick - all integer arithmetic.
    "a15_weighted_median" -> ((s, dir) => Aggregates.weightedMedian(Tables.lineitem(s, dir))),
    // Canonicalization audit: lowercase + punctuation strip + whitespace
    // collapse per doc, with the normalized md5 prefix as the
    // formatting-insensitive dedup key; row-local, shuffle-free.
    "t29_normalize" -> ((s, dir) => TextOps.normalizeStats(Tables.documents(s, dir))),
    // Benford first-digit forensics on order totals: digit from the
    // integer-cents rendering (never float log10/formatting), permille
    // shares vs literal Benford expectations; one 9-key hash aggregate.
    "dq12_benford" -> ((s, dir) => Quality.benfordDigits(Tables.orders(s, dir))),
    // First-order Markov transition matrix over each user's event stream:
    // lag pairs on ONE user_id exchange, then a |type|^2 metadata-scale
    // grid with integer basis-point out-shares and floor-average gaps.
    "e16_transitions" -> ((s, dir) => Sessions.eventTransitions(Tables.events(s, dir))),
    // Blocked entity resolution on part names: canonicalize to DISTINCT
    // names first (work/output bounded by the name domain, not rows),
    // then rarest-token block key + Levenshtein <= 3 inside the equi
    // join condition - subquadratic record linkage, no cartesian.
    "j16_blocked_er" -> ((s, dir) => EntityResolution.blockedNamePairs(Tables.part(s, dir))),
    // Snapshot diff: added/removed/changed between two table versions via
    // one full-outer join; unchanged mass dropped before the sort.
    "e7_snapshot_diff" -> ((s, dir) => MergeOps.snapshotDiffDemo(Tables.orders(s, dir))),
    // Domain caps: at most 10 docs per source, deterministic keep-set,
    // WindowGroupLimit caps the shuffle at cap rows/source per map task.
    "t16_source_caps" -> ((s, dir) => TextOps.sourceCaps(Tables.documents(s, dir), 10)),
    // Deterministic train/val/test split (12/2/2 sixteenths of the key
    // hash) with the disjoint+covering contract driver-witnessed as TRUE.
    "d11_split_contract" -> ((s, dir) => TextOps.splitContract(Tables.documents(s, dir))),
    // Group-aware split (distributed GroupShuffleSplit): whole sources
    // co-travel, leakage witness proven zero.
    "d17_group_split" -> ((s, dir) => TextOps.groupSplit(Tables.documents(s, dir))),
    // EXACT Jaccard join (AllPairs prefix filter) at 4/5 — below d3b's
    // 0.9, where LSH recall < 1 would drop pairs; oracle is brute-force
    // all-pairs with the identical integer threshold arithmetic.
    "d18_jaccard_join" -> ((s, dir) =>
      Dedup.prefixFilterJoin(Tables.documents(s, dir), 4, 5, materialize = true)),
    // Token-budget mixture sampling: cap each source at 768 tokens in
    // content-addressed hash order. Two-phase (bucket prefix-sums, then a
    // row-level window over ONLY the boundary bucket) — no per-source
    // whole-corpus window; oracle is the naive single-window form.
    "d13_token_budget" -> ((s, dir) =>
      TrainingPipeline.tokenBudgetMix(Tables.documents(s, dir), 768L)),
    // Tokenizer-coverage check: per-doc OOV rate vs the top-50 corpus
    // vocabulary (broadcast as ONE array row; no (doc,term) shuffle).
    "t17_oov_rate" -> ((s, dir) => TextOps.oovRate(Tables.documents(s, dir), 50)),
    // Corpus top-20 5-gram phrases via the native streaming Generator
    // (the UDTF leg of the custom-extension trio).
    "t20_top_shingles" -> ((s, dir) => TextOps.topShingles(Tables.documents(s, dir))),
    // Overlapping token-window chunking (32-token windows, stride 24 ->
    // 8-token overlap): the embedding-prep cut that loses no boundary.
    "t18_chunk_overlap" -> ((s, dir) =>
      TextOps.chunkWithOverlap(Tables.documents(s, dir), 32, 24)
        .orderBy("doc_id", "chunk_idx")),
    "u2_except" -> ((s, dir) => SetOps.exceptKeys(Tables.customer(s, dir), Tables.orders(s, dir))),
    "u3_intersect" -> ((s, dir) => SetOps.intersectKeys(Tables.customer(s, dir), Tables.orders(s, dir))),
    // Bag-semantics set ops: multiplicity differences/minima, which the
    // set forms u2/u3 cannot express (count state ∝ distinct keys).
    "u5_except_all" -> ((s, dir) => SetOps.exceptAllPriorities(Tables.orders(s, dir))),
    "u6_intersect_all" -> ((s, dir) => SetOps.intersectAllPriorities(Tables.orders(s, dir))),
    "u7_symmetric_diff" -> ((s, dir) => SetOps.symmetricDiffPriorities(Tables.orders(s, dir))),
    // Two-sample KS drift per series: unbinned sup-norm ECDF distance
    // between time halves — the location-shift detector dq26's binned
    // TVD can miss; one value-keyed aggregate + one distinct-value window.
    "dq32_ks_drift" -> ((s, dir) => Quality.ksDrift(Tables.events(s, dir))),
    // Daily-revenue autocorrelation at lags 1..7: exact integer
    // numerator/denominator pairs (floor-mean centering), calendar-day
    // lag alignment — the weekly-seasonality diagnostic behind e29.
    "e45_autocorrelation" -> ((s, dir) =>
      TimeSeries.autocorrelation(Tables.orders(s, dir))),
    // Gain/lift deciles per source: ntile(10) over the total (score,
    // doc_id) order — the top-p% capture/lift table behind dq18's AUC.
    "dq33_lift_deciles" -> ((s, dir) =>
      Evaluation.liftDeciles(Tables.documents(s, dir))),
    // DataFrameStatFunctions.crosstab surface on a 3-value column.
    "a25_crosstab" -> ((s, dir) =>
      Aggregates.crosstabPriorityStatus(Tables.orders(s, dir))),
    // MMR diversity rerank (λ=1/2) of the top-32 inner-product hits:
    // greedy argmax fold on exact micro-unit dots, tie-break vec_id.
    "s21_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(Tables.embeddings(s, dir))),
    // Null-safe full-outer cohort join: NULL is a matchable key (the
    // unattributed bucket), pre-aggregated per side so the null key
    // carries one row, not a skew block.
    "j36_nullsafe_join" -> ((s, dir) =>
      JoinOps.nullSafeCohortJoin(Tables.events(s, dir))),
    // Month-over-month / year-over-year revenue deltas, calendar-key
    // aligned (mk−1 / mk−12 joins), truncating div verified both engines.
    "e46_period_over_period" -> ((s, dir) =>
      TimeSeries.periodOverPeriod(Tables.orders(s, dir))),
    // count_if / bool_and / bool_or / struct-determinized argmax battery.
    "a26_bool_aggregates" -> ((s, dir) =>
      Aggregates.boolAggBattery(Tables.orders(s, dir))),
    // Per-column Gini impurity + inverse-Simpson effective categories:
    // the rational (log-free) concentration screen behind dq1's profile.
    "dq34_gini_impurity" -> ((s, dir) =>
      Quality.giniImpurity(Tables.events(s, dir))),
    // Intra-list diversity: MMR's pick set vs plain top-k, exact
    // pair-dot sums — the contract that the rerank diversified.
    "s22_mmr_diversity" -> ((s, dir) =>
      Similarity.mmrDiversityContract(Tables.embeddings(s, dir))),
    // Winsorized per-priority stats: exact discrete p05/p95 clamp via
    // count-based order statistics — no per-row sort, bounds broadcast.
    "dq35_winsorized_stats" -> ((s, dir) =>
      Quality.winsorizedStats(Tables.orders(s, dir))),
    // Power-of-two EWMA of daily revenue: exact BIGINT fraction,
    // calendar-day alignment, gap days renormalize via wt_den.
    "e47_ewma" -> ((s, dir) => TimeSeries.ewma(Tables.orders(s, dir))),
    // Sorted-neighborhood blocking (SNM): block-ranked key sort, w=4
    // neighbor equi-join, levenshtein-verified pairs — linear candidates.
    "d25_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhood(Tables.documents(s, dir))),
    // Kaplan-Meier survival table: exact (n_risk, d_events) sufficient
    // statistics per event time; windows over distinct tenure days only.
    "e48_kaplan_meier" -> ((s, dir) =>
      TimeSeries.kaplanMeier(Tables.orders(s, dir))),
    // Walk-forward CV folds with embargo: integer day-span boundaries,
    // realized train/test counts from the daily-count frame.
    "d26_temporal_split" -> ((s, dir) =>
      TrainingPipeline.temporalSplit(Tables.orders(s, dir))),
    // m-estimate target encoding of customer nation: floor-quotient
    // shrinkage toward the global mean, mergeable (n, Σ) emitted.
    "d27_target_encoding" -> ((s, dir) =>
      TrainingPipeline.targetEncoding(Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))),
    // Blocking-scheme evaluation: SNM candidates vs normalized-text
    // ground truth — pairs completeness + reduction ratio, exact permille.
    "d28_blocking_eval" -> ((s, dir) =>
      Dedup.blockingEval(Tables.documents(s, dir))),
    // Exact-rational linear interpolation of gap days in daily revenue:
    // two IGNORE-NULLS window passes over the calendar spine.
    "e49_linear_interp" -> ((s, dir) =>
      TimeSeries.linearInterp(Tables.orders(s, dir))),
    // Bitwise aggregate battery: bit_and/or/xor + popcount per group —
    // order-independent, map-side-combining.
    "p15_bitwise_battery" -> ((s, dir) =>
      ColumnOps.bitwiseBattery(Tables.orders(s, dir))),
    // ER classify step: integer Fellegi-Sunter-style field-agreement
    // scores over rarest-token-blocked name pairs.
    "j37_er_scoring" -> ((s, dir) =>
      EntityResolution.erMatchScores(Tables.part(s, dir))),
    // Time-decay multi-touch attribution: floor shares + residual to the
    // most recent touch — credits reconcile to purchase value exactly.
    "e50_decay_attribution" -> ((s, dir) =>
      Sessions.decayAttribution(Tables.events(s, dir))),
    // Referential sampling audit: md5-nibble customer slice, lineitems
    // follow their order via semi-join; orphan count 0 by construction.
    "d29_referential_sample" -> ((s, dir) =>
      TrainingPipeline.referentialSample(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // Multi-pass SNM: forward + reversed-key passes with per-pass
    // provenance flags — the recall remedy for single-pass blind spots.
    "d30_snm_multipass" -> ((s, dir) =>
      Dedup.snmMultipass(Tables.documents(s, dir))),
    // try_* error-safety battery: null-on-failure semantics under ANSI
    // mode, identical poisoned rows in both engines.
    "p16_try_battery" -> ((s, dir) =>
      ColumnOps.tryBattery(Tables.orders(s, dir))),
    // Balanced range-partition planning from the day histogram: quantile
    // strips by integer prefix sums, fill factor vs ideal per partition.
    "k3_range_planner" -> ((s, dir) =>
      graft.sources.Sinks.rangePlanner(Tables.orders(s, dir))),
    // Weekday-adjusted volume anomalies: median-of-4 same-weekday
    // baseline kept as an integer sum, exact permille deviation.
    "dq36_volume_anomaly" -> ((s, dir) =>
      Quality.volumeAnomalies(Tables.events(s, dir))),
    // Target encoding computed through a two-batch stats merge; the
    // oracle is the FULL-batch SQL, so hash equality proves the merge.
    "d31_encoding_merge" -> ((s, dir) =>
      TrainingPipeline.targetEncodingMerged(Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))),
    // LTV triangle: cumulative cohort revenue by weeks-since-acquisition
    // — exact cents, cumulative window over the cohort×age grid only.
    "e51_ltv_triangle" -> ((s, dir) =>
      TimeSeries.ltvTriangle(Tables.orders(s, dir))),
    // Degree assortativity sufficient stats (Newman's r numerators):
    // exact integers over the support-pruned co-purchase edges.
    "g12_assortativity" -> ((s, dir) =>
      GraphOps.assortativityStats(Tables.lineitem(s, dir))),
    // Bag-semantics Jaccard over SNM pairs: Σmin/Σmax on token multisets
    // via the Σmax = sa + sb − Σmin identity — inner joins only.
    "d32_bag_jaccard" -> ((s, dir) =>
      Dedup.bagJaccardPairs(Tables.documents(s, dir))),
    // √-temperature language mix: exact floor-sqrt weights, budget
    // apportioned by largest remainder — sums to budget exactly.
    "d33_temperature_mix" -> ((s, dir) =>
      TrainingPipeline.temperatureMix(Tables.documents(s, dir))),
    // Deferred revenue recognition: each day's bookings spread over 30
    // days with floor + last-day residual — zero reconciliation drift.
    "e53_rev_recognition" -> ((s, dir) =>
      TimeSeries.revenueRecognition(Tables.orders(s, dir))),
    // Biggest movers: part revenue rank deltas between two years —
    // integer ranks survive the hash gate where revenue ratios wouldn't.
    "a27_rank_movers" -> ((s, dir) =>
      Aggregates.rankMovers(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // ER pipeline closure: connected components over SNM verified pairs
    // — block → verify → cluster, min-doc labels.
    "d34_snm_clusters" -> ((s, dir) =>
      Dedup.snmClusters(Tables.documents(s, dir))),
    // Incremental CC by contraction over a parity edge split; the oracle
    // is the FULL recompute — hash equality proves the maintenance path.
    "g13_cc_incremental" -> ((s, dir) =>
      GraphOps.coPurchaseComponentsIncremental(Tables.lineitem(s, dir))),
    // Daily P50/P90/P99 of event value: discrete order statistics from
    // the count-based cumulative pass — distinct-value state per day.
    "e54_daily_percentiles" -> ((s, dir) =>
      TimeSeries.dailyPercentiles(Tables.events(s, dir))),
    // Open-order backlog: ±1 delta stream (placement / day after last
    // ship) with a running sum over the day grid — never per-day scans.
    "e55_open_orders" -> ((s, dir) =>
      TimeSeries.openOrderBacklog(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // Top-N customers per priority + an OTHER residual row — group
    // totals preserved, ranks deterministic.
    "a28_topn_other" -> ((s, dir) =>
      Aggregates.topNWithOther(Tables.orders(s, dir))),
    // Near-dup split-leakage audit: SNM clusters straddling the md5
    // train/eval boundary — the contamination number a corpus publishes.
    "d35_split_leakage" -> ((s, dir) =>
      Dedup.splitLeakage(Tables.documents(s, dir))),
    // Normalization funnel: distinct docs at raw / casefold / ws-collapse
    // / alnum equality — each delta is that step's newly-merged dup mass.
    "d36_normalization_funnel" -> ((s, dir) =>
      Dedup.normalizationFunnel(Tables.documents(s, dir))),
    // 4-4-5 fiscal periods from pure integer week arithmetic — the
    // retail calendar without a calendar library.
    "e56_fiscal_calendar" -> ((s, dir) =>
      TimeSeries.fiscalCalendar(Tables.orders(s, dir))),
    // Heaps-law vocab growth: token → first-doc MIN, checkpoint binning,
    // cumulative over bins — never k distinct-count corpus scans.
    "t42_vocab_growth" -> ((s, dir) =>
      TextOps.vocabGrowth(Tables.documents(s, dir))),
    // Weekly growth ledger: new / retained / resurrected / churned via
    // first-seen MIN + week-shifted joins — work ∝ distinct user-weeks.
    "e57_growth_accounting" -> ((s, dir) =>
      Sessions.growthAccounting(Tables.events(s, dir))),
    // Price-volume-mix bridge per brand with an explicit residual —
    // Δ = vol + price + residual holds to the cent by construction.
    "a29_price_volume_mix" -> ((s, dir) =>
      Aggregates.priceVolumeMix(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.part(s, dir))),
    // Retrieval margin census: exact integer-dot gap between ranks 1-2
    // per query — the trust-or-rerank ambiguity metric.
    "s23_margin_stats" -> ((s, dir) =>
      SimilarityIndex.marginStats(Tables.embeddings(s, dir))),
    // ABC Pareto classes: integer cumulative-share boundaries (≤800‰ A,
    // ≤950‰ B) with deterministic ranking ties.
    "a30_abc_classes" -> ((s, dir) =>
      Aggregates.abcClasses(Tables.lineitem(s, dir))),
    // Weekday ANOVA sufficient stats: floor-mean SSB/SST exact BIGINTs —
    // η² permille says whether weekday structure is worth modeling.
    "e58_weekday_anova" -> ((s, dir) =>
      TimeSeries.weekdayAnova(Tables.orders(s, dir))),
    // DAU/WAU stickiness: Σ daily actives ×1000 div (7×weekly actives) —
    // two distinct frames, work ∝ distinct user-days.
    "e59_stickiness" -> ((s, dir) =>
      Sessions.stickiness(Tables.events(s, dir))),
    // Order-size mix vs GLOBAL discrete terciles — fixed band edges
    // reveal drift that per-year terciles would hide by construction.
    "a31_order_size_mix" -> ((s, dir) =>
      Aggregates.orderSizeMix(Tables.orders(s, dir))),
    // Cumulative adoption via first-seen linearization — never a running
    // COUNT(DISTINCT) (quadratic state at scale).
    "e52_adoption_curve" -> ((s, dir) =>
      Sessions.adoptionCurve(Tables.events(s, dir))),
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
    "o_topk" -> ((s, dir) => SetOps.topK(Tables.orders(s, dir), 10)),
    // OHLC resampling: hourly open/high/low/close/volume bars per event
    // type — min_by/max_by on a (us, event_id) struct, ONE hash aggregate
    // with map-side combine, no sort/window over the raw stream.
    "e18_ohlc_bars" -> ((s, dir) => TimeSeries.ohlcBars(Tables.events(s, dir))),
    // Interval union per user (30-min activity holds): running-max island
    // merge, one user_id exchange end-to-end, integer-µs coverage stats.
    "e19_interval_coverage" -> ((s, dir) => TimeSeries.intervalCoverage(Tables.events(s, dir))),
    // Sequential path mining: consecutive event-type trigrams per user —
    // two leads over one window, grid aggregation ≤ |type|³ rows.
    "e20_trigram_paths" -> ((s, dir) => Sessions.trigramPaths(Tables.events(s, dir))),
    // Per-series OLS trend slope as an exact integer rational (num/den
    // BIGINTs, FP division left to the consumer): minutes-offset x from
    // each series' own start, window min + aggregate share one user_id
    // exchange.
    "e24_trend_slopes" -> ((s, dir) => TimeSeries.trendSlopes(Tables.events(s, dir))),
    // Max drawdown per series: running-max window + aggregate + earliest
    // trough via an argmax equi-join — one event_type partitioning.
    "e25_max_drawdown" -> ((s, dir) => TimeSeries.maxDrawdown(Tables.events(s, dir))),
    // RSI over hourly closes in integer permille (Cutler's simple form —
    // the hash-pinnable one); warm-up and flat windows report null.
    "e26_rsi" -> ((s, dir) => TimeSeries.rsiBars(Tables.events(s, dir))),
    // Bullish-engulfing scan: fixed-length sequence pattern as one lag
    // window + row predicate (MATCH_RECOGNIZE-lite), integer cents.
    "e27_engulfing" -> ((s, dir) => TimeSeries.engulfingBars(Tables.events(s, dir))),
    // EXACT set-containment join at 4/5 (quote/truncation detection):
    // contained side keeps its AllPairs prefix, container side indexes
    // all tokens — the asymmetric complement of d18.
    "d19_containment" -> ((s, dir) =>
      Dedup.containmentJoin(Tables.documents(s, dir), 4, 5, materialize = true)),
    // EXACT edit-distance join (PassJoin segment pigeonhole) at k=4 on
    // 32-char prefixes: character-SEQUENCE closeness — the typo/OCR
    // regime where one edit kills every shingle crossing it, invisible
    // to the token-set joins d18/d19. Candidates from one equi-join on
    // (segment_index, substring); verification is codegen'd levenshtein.
    "d20_edit_distance" -> ((s, dir) =>
      Dedup.editDistanceJoin(Tables.documents(s, dir), 4, 32)),
    // Weighted systematic sampling: exactly 5 picks per language,
    // probability ∝ n_chars, pure integer-division grid test — the
    // engine-exact alternative to FP exponential-key (A-ES) sampling.
    "t30_weighted_sample" -> ((s, dir) => TextOps.weightedSample(
      Tables.documents(s, dir), "doc_id", "lang", "n_chars", 5)),
    // 2-D skyline (min price, max size): bucket pre-prune + exact
    // running-max pass — never the quadratic NOT-EXISTS self-join.
    "o_skyline" -> ((s, dir) => SetOps.skyline2d(Tables.part(s, dir))),
    // CDC changelog apply: per-key max_by compaction (last op wins, D
    // deletes) + ONE full-outer merge into the base snapshot.
    "e21_cdc_apply" -> ((s, dir) =>
      MergeOps.cdcApplyDemo(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Incremental join-view maintenance: ΔL⋈O₀ ∪ L₀⋈ΔO ∪ ΔL⋈ΔO added to
    // the stored view equals the full recompute — TRUE-boolean contract.
    "e22_join_maintenance" -> ((s, dir) =>
      MergeOps.joinMaintenanceDemo(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Exact Pearson sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) per
    // group — one map-side-combining aggregate, FP left to the consumer.
    "dq13_correlation_stats" -> ((s, dir) =>
      Quality.correlationStats(Tables.lineitem(s, dir))),
    // CUSUM drift detection: the max(0, S+y) recurrence as prefix-sum
    // minus running-min — two windows, one exchange, integer-exact.
    "dq14_cusum" -> ((s, dir) => Quality.cusumRate(Tables.events(s, dir))),
    // Multi-source bounded BFS over the g3 co-purchase graph: frontier
    // iteration, visited anti-join, eager checkpoints — min-hop exact.
    "g4_bfs_hops" -> ((s, dir) =>
      GraphOps.bfsHopsDemo(Tables.lineitem(s, dir), Tables.part(s, dir))),
    // Deterministic mode (most-frequent, smallest on ties) — two hash
    // aggregates; the builtin mode() tie-break is partition-order noise.
    "a16_mode" -> ((s, dir) => Aggregates.modeOf(Tables.lineitem(s, dir))),
    // Interval-overlap join: sessions × anomalous hours via broadcast
    // nested-loop (incident side is metadata-scale) — the third point on
    // the non-equi strategy surface next to j7 range and j12 binning.
    "e23_session_incidents" -> ((s, dir) =>
      Sessions.sessionIncidentOverlap(Tables.events(s, dir))),
    // Corpus-wide segment dedup (repeated-paragraph removal, keep first
    // occurrence) with per-doc reconstruction — three linear stages.
    "t31_segment_dedup" -> ((s, dir) =>
      TextOps.segmentDedup(Tables.documents(s, dir))),
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
    // Chi-squared token<->label association, DECIMAL(38) exact: the top
    // tokens whose presence is most associated with lang='en'.
    "t32_chi2_tokens" -> ((s, dir) =>
      Evaluation.chi2Association(Tables.documents(s, dir))),
    // Golden-record attribute survivorship: per-attribute latest non-null
    // with provenance, composed from different events per column.
    "e28_golden_record" -> ((s, dir) =>
      MergeOps.goldenRecord(Tables.events(s, dir))),
    // Inverted-index build: df/cf + top-3 postings by (tf desc, doc_id)
    // per token, bounded group state via the windowed-rank guard.
    "t33_inverted_index" -> ((s, dir) =>
      TextOps.invertedIndex(Tables.documents(s, dir))),
    // Hybrid retrieval: reciprocal-rank fusion of the s1 dense cosine
    // ranking and the t22 sparse BM25 ranking, floor-integer RRF terms.
    "s14_rrf_fusion" -> ((s, dir) =>
      Similarity.rrfFusion(Tables.embeddings(s, dir), Tables.documents(s, dir),
        0L, Seq("spark", "vector", "merge"))),
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
    // Seasonal-naive backtest: hour-vs-same-hour-yesterday forecast error
    // per event_type over the calendar-joined hourly grid.
    "e29_seasonal_backtest" -> ((s, dir) =>
      TimeSeries.seasonalBacktest(Tables.events(s, dir))),
    // Type-token ratio + hapax share per source, floor permille.
    "t34_lexical_diversity" -> ((s, dir) =>
      TextOps.lexicalDiversity(Tables.documents(s, dir))),
    // Exact-percentile curation cut (top 30% by the 0-4 quality score):
    // histogram-walk threshold, ties kept, per-language kept counts.
    "t35_quality_cut" -> ((s, dir) =>
      TextOps.qualityPercentileCut(Tables.documents(s, dir))),
    // Length-bucketed batching with per-batch padding-waste accounting;
    // fixed-width buckets keep every window keyed (no global ntile).
    "t36_length_batches" -> ((s, dir) =>
      TextOps.lengthBatches(Tables.documents(s, dir))),
    // Per-dimension embedding stats (n, mean, variance in micro-units)
    // via the one-pass vector-sum Aggregator — no n×d explode shuffle.
    "s16_dim_stats" -> ((s, dir) =>
      Similarity.dimStats(Tables.embeddings(s, dir))),
    // Incremental sessionization across a time cut with carried open-
    // session state; the one-shot e6 SQL is the oracle, so the hash gate
    // proves incremental == full recompute.
    "e30_incremental_sessions" -> ((s, dir) =>
      Sessions.incrementalSessionize(Tables.events(s, dir))),
    // Crawl-overlap matrix: exact-duplicate pairs within and across
    // sources, from (text-hash, source) counts.
    "d21_cross_source_dups" -> ((s, dir) =>
      Dedup.crossSourceDups(Tables.documents(s, dir))),
    // Order-independent content checksums (bit-XOR of canonical row
    // hashes + count/min/max) for three tables - the publish-integrity
    // artifact any engine reproduces.
    "dq22_table_checksum" -> ((s, dir) =>
      Quality.tableChecksums(Tables.orders(s, dir), Tables.lineitem(s, dir),
        Tables.customer(s, dir))),
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
    // Retrieval-quality metrics (hit@k / MRR / recall@k in floor
    // permille, label agreement as relevance) over the s3 ranking.
    "s15_retrieval_eval" -> ((s, dir) =>
      Evaluation.retrievalEval(Tables.embeddings(s, dir), (0L until 20L), 20)),
    // Integer-exact CUSUM changepoint per series: argmax |n·S_i − i·S_n|
    // over hourly totals, before/after sums as exact rationals.
    "e31_cusum_changepoint" -> ((s, dir) =>
      TimeSeries.cusumChangepoint(Tables.events(s, dir))),
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
    // TPC-H Q6 shape: single-scan conditional aggregate, all three range
    // predicates scan-pushable; discount band in integer permille.
    "a19_q6_revenue" -> ((s, dir) =>
      Aggregates.q6ForecastRevenue(Tables.lineitem(s, dir))),
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
    // Per-type column completeness matrix in integer permille — one
    // keyed aggregate, one sum(when) per nullable column.
    "dq23_completeness" -> ((s, dir) =>
      Quality.completenessMatrix(Tables.events(s, dir))),
    // Exact p50/p90/p99 order->ship latency days per priority class via
    // a per-group histogram walk (no approx percentile, no global sort).
    "dq24_fulfillment_sla" -> ((s, dir) =>
      Quality.fulfillmentLatency(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    // Degree distribution of the co-purchase graph — the heavy-tail
    // diagnostic the other graph operators size against.
    "g7_degree_hist" -> ((s, dir) =>
      GraphOps.degreeHistogram(Tables.lineitem(s, dir))),
    // Duplicate-payment audit: equi-join on (customer, exact cents)
    // with a day-window conjunct — double-submit forensics.
    "dq25_duplicate_payments" -> ((s, dir) =>
      Quality.duplicatePayments(Tables.orders(s, dir))),
    // ORACLE-EXACT MinHash+LSH: md5-derived affine permutation family
    // both engines compute bit-identically — the full sign→band→bucket-
    // join→verify pipeline under the hash gate (d3's fast seeded kernel
    // stays rows-only with its contract twin).
    "d22_minhash_oracle" -> ((s, dir) =>
      Dedup.minhashOraclePairs(Tables.documents(s, dir))),
    // ORACLE-EXACT SimHash: md5-bit-sum 60-bit signature, 4×15-bit
    // pigeonhole bands (complete for Hamming ≤ 3), bit_count(xor)
    // verify — the d4 companion to d22.
    "d23_simhash_oracle" -> ((s, dir) =>
      Dedup.simhashOraclePairs(Tables.documents(s, dir))),
    // ORACLE-EXACT hyperplane-LSH ANN: LCG integer planes, 6×5-bit sign
    // bands, exact integer-cosine verify in 16-byte decimals — the s2
    // companion to d22/d23.
    "s17_ann_oracle" -> ((s, dir) =>
      Similarity.annOraclePairs(Tables.embeddings(s, dir))),
    // The md5-affine signature TABLE itself (d5's oracle-exact twin):
    // per-doc h0..h7 permutation minima, hash-checked value by value.
    "d24_signatures_oracle" -> ((s, dir) =>
      Dedup.minhashOracleSignatures(Tables.documents(s, dir))
        .orderBy("doc_id")),
    // Common-neighbor link prediction over the support-pruned co-purchase
    // graph — the "customers also buy" candidate generator.
    "g8_link_prediction" -> ((s, dir) =>
      GraphOps.linkPrediction(Tables.lineitem(s, dir))),
    // A-priori frequent triples (market-basket level 3) with the item
    // prune executed and the plain triple join as referee.
    "g9_frequent_triples" -> ((s, dir) =>
      GraphOps.frequentTriples(Tables.lineitem(s, dir))),
    // Bollinger ±2σ breakouts decided by integer cross-multiplication.
    "e32_bollinger" -> ((s, dir) =>
      TimeSeries.bollingerBreakouts(Tables.events(s, dir))),
    // Hourly VWAP with the JSON `k` field as volume.
    "e33_vwap" -> ((s, dir) => TimeSeries.vwapBars(Tables.events(s, dir))),
    // Duration-weighted TWAP per series over irregular event spacing.
    "e34_twap" -> ((s, dir) => TimeSeries.twap(Tables.events(s, dir))),
    // First-half vs second-half total-variation drift in floor permille.
    "dq26_distribution_drift" -> ((s, dir) =>
      Quality.distributionDrift(Tables.events(s, dir))),
    // Per-series event_id sequence-gap audit (CDC offset integrity).
    "dq27_sequence_gaps" -> ((s, dir) =>
      Quality.sequenceGaps(Tables.events(s, dir))),
    // Two-measure pivot compiled to one conditional hash aggregate.
    "a20_pivot_multi" -> ((s, dir) =>
      Aggregates.pivotMultiAgg(Tables.orders(s, dir))),
    // MIPS top-k: raw inner-product ranking (two-tower recommender
    // serving) via the codegen'd DotProduct expression.
    "s18_mips" -> ((s, dir) =>
      Similarity.mipsTopK(Tables.embeddings(s, dir), 0L, 20)),
    // Row-local character-class permilles — the pre-tokenizer QA screen.
    "t37_char_profile" -> ((s, dir) =>
      TextOps.charClassProfile(Tables.documents(s, dir))),
    // Share of bigrams outside the corpus head — templatedness signal.
    "t38_bigram_novelty" -> ((s, dir) =>
      TextOps.bigramNovelty(Tables.documents(s, dir))),
    // Longest strictly-rising/falling step runs per user (islands trick).
    "w_streaks" -> ((s, dir) => WindowOps.streaks(Tables.events(s, dir))),
    // Spark 4 VARIANT path: parse_json once, typed variant_get per field.
    "e35_variant_extract" -> ((s, dir) =>
      TextOps.variantExtract(Tables.events(s, dir))),
    // Vocab-size vs corpus-coverage checkpoints (tokenizer sizing curve).
    "t39_vocab_coverage" -> ((s, dir) =>
      TextOps.vocabCoverage(Tables.documents(s, dir))),
    // Lorenz-checkpoint revenue concentration: top 1/5/10% customer share.
    "dq28_concentration" -> ((s, dir) =>
      Quality.revenueConcentration(Tables.orders(s, dir))),
    // Inter-arrival burstiness: log2-second buckets via binary digit count.
    "e36_interarrival_hist" -> ((s, dir) =>
      TimeSeries.interarrivalHistogram(Tables.events(s, dir))),
    // Share-of-parent drill-down tree in floor basis points.
    "a21_share_tree" -> ((s, dir) =>
      Aggregates.shareTree(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    // Association rules: confidence-bp + lift-permille per frequent pair.
    "g10_association_rules" -> ((s, dir) =>
      GraphOps.associationRules(Tables.lineitem(s, dir))),
    // Day-of-week profile by pure epoch arithmetic (no locale DOW).
    "a22_weekday_revenue" -> ((s, dir) =>
      Aggregates.weekdayRevenue(Tables.orders(s, dir))),
    // RFM quintile census (ntile over customers with total key order).
    "a23_rfm_cells" -> ((s, dir) => Aggregates.rfmCells(Tables.orders(s, dir))),
    // Strict local maxima/minima per series over hourly close bars.
    "e37_peaks" -> ((s, dir) =>
      TimeSeries.peakDetection(Tables.events(s, dir))),
    // Pairwise source vocabulary Jaccard (distributional overlap).
    "t40_source_overlap" -> ((s, dir) =>
      TextOps.sourceVocabOverlap(Tables.documents(s, dir))),
    // Order-size histogram: the profile basket mining is sized from.
    "a24_basket_hist" -> ((s, dir) =>
      Aggregates.basketHistogram(Tables.lineitem(s, dir))),
    // Hour-of-day seasonality fingerprint per series (pure µs arithmetic).
    "e38_diurnal_profile" -> ((s, dir) =>
      TimeSeries.diurnalProfile(Tables.events(s, dir))),
    // Lifetime-span histogram in weeks with activity density.
    "e39_tenure_hist" -> ((s, dir) =>
      TimeSeries.tenureHistogram(Tables.events(s, dir))),
    // Cents-remainder distribution — the trailing-digit fraud screen.
    "dq29_price_endings" -> ((s, dir) =>
      Quality.priceEndings(Tables.orders(s, dir))),
    // Avg pairwise dot per label from SUMS ONLY (no pair join).
    "s19_label_cohesion" -> ((s, dir) =>
      Similarity.labelCohesion(Tables.embeddings(s, dir))),
    // First-view -> first-purchase latency histogram (log2 buckets).
    "e40_conversion_lag" -> ((s, dir) =>
      TimeSeries.conversionLag(Tables.events(s, dir))),
    // Error-budget burn per day (integer cross-multiplied rates).
    "dq30_slo_burn" -> ((s, dir) => Quality.sloBurn(Tables.events(s, dir))),
    // Same-(user, microsecond) pile-ups: the double-fire audit.
    "dq31_ts_collisions" -> ((s, dir) =>
      Quality.timestampCollisions(Tables.events(s, dir))),
    // Delete-aware incremental aggregate maintenance: group state
    // retracts for free, extrema detect when they must rescan.
    "e41_retractable_agg" -> ((s, dir) =>
      Quality.retractableAggContract(Tables.events(s, dir))),
    // Sign-bit Hamming pre-rank vs exact dot top-k: recall@k contract
    // for the 32x-compressed binary retrieval tier.
    "s20_hamming_prerank" -> ((s, dir) =>
      SimilarityIndex.hammingPrerank(Tables.embeddings(s, dir))),
    // Valid-time x transaction-time resolution with retro corrections:
    // what we knew at D vs what we know now, per priority class.
    "e42_bitemporal" -> ((s, dir) =>
      MergeOps.bitemporalAsOf(Tables.orders(s, dir))),
    // Integer Flesch reading-ease deciles per language.
    "t41_readability" -> ((s, dir) =>
      TextOps.readabilityCensus(Tables.documents(s, dir))),
    // Synchronous LPA communities (3 rounds, count-then-min tie-break)
    // on the support-pruned co-purchase graph.
    "g11_lpa_communities" -> ((s, dir) =>
      GraphOps.lpaCommunities(Tables.lineitem(s, dir))),
    // OPTIMIZE-style bin packing over file statistics: prefix-sum
    // cuts per partition, pure metadata.
    "k1_compaction_plan" -> ((s, dir) =>
      graft.sources.Sinks.compactionPlan(Tables.lineitem(s, dir))),
    // MATCH_RECOGNIZE-lite (PATTERN V C* P) via event-string
    // projection and non-overlapping greedy regex.
    "e43_pattern_match" -> ((s, dir) =>
      Sessions.patternMatch(Tables.events(s, dir))),
    // Zone-map min/max skipping audit: files skipped, rows scanned
    // vs rows matching under a quantity predicate.
    "k2_skipping_stats" -> ((s, dir) =>
      graft.sources.Sinks.skippingStats(Tables.lineitem(s, dir))),
    // Non-associative threshold-reset fold: the voucher/budget-cap
    // recurrence no window frame can express.
    "w_reset_running_total" -> ((s, dir) =>
      TimeSeries.resetRunningTotal(Tables.events(s, dir))),
    // Closed-form integer business-day SLA lag histogram.
    "e44_busday_lag" -> ((s, dir) =>
      TimeSeries.busdayLag(Tables.orders(s, dir), Tables.lineitem(s, dir))),
  )

  /** d6 curation-gate oracle — shared by the untyped (d6_curated) and
    * typed (d6b_curated_typed) implementations: one SQL referee proving
    * both paths compute the identical result.
    */
  private val CuratedSql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks,
      |         length(text) AS nc
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, text, nc, CAST(len(toks) AS INT) AS nt,
      |   CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
      |   CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
      |  FROM t
      |), q AS (
      |  SELECT doc_id, text, nt,
      |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
      |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
      |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
      |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS score,
      |    CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS plang
      |  FROM c
      |)
      |SELECT min(doc_id) AS doc_id, CAST(min(nt) AS INT) AS n_tokens
      |FROM q WHERE score >= 3 AND plang = 'en'
      |GROUP BY text ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Shared SCD2-reconstruction CTE prefix (dim → nib → upd → merged):
    * ONE encoding of the e2 merge semantics, composed into both the
    * e2_scd2_merge and e11_pit_lookup oracles so they can never silently
    * encode different SCD2 states.
    */
  private val scd2MergedCte: String =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      |), nib AS (
      |  SELECT c_custkey,
      |    instr('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1 AS nb
      |  FROM customer
      |), upd AS (
      |  SELECT d.c_custkey, 'RELOCATED' AS c_mktsegment, d.c_acctbal
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb < 4
      |  UNION ALL
      |  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb >= 4 AND nb < 6
      |  UNION ALL
      |  SELECT d.c_custkey + 10000000, 'NEWSEG', 0.0
      |  FROM dim d JOIN nib USING (c_custkey) WHERE nb >= 14
      |), merged AS (
      |  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
      |         CAST(0 AS BIGINT) AS valid_from,
      |         CASE WHEN u.c_custkey IS NOT NULL AND
      |                   (u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |                    u.c_acctbal IS DISTINCT FROM d.c_acctbal)
      |              THEN CAST(1 AS BIGINT) END AS valid_to,
      |         NOT (u.c_custkey IS NOT NULL AND
      |              (u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |               u.c_acctbal IS DISTINCT FROM d.c_acctbal)) AS is_current
      |  FROM dim d LEFT JOIN upd u USING (c_custkey)
      |  UNION ALL
      |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
      |         CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
      |  FROM upd u LEFT JOIN dim d USING (c_custkey)
      |  WHERE d.c_custkey IS NULL OR
      |        u.c_mktsegment IS DISTINCT FROM d.c_mktsegment OR
      |        u.c_acctbal IS DISTINCT FROM d.c_acctbal
      |)""".stripMargin

  private val d9OracleSql: String =
    """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, nb,
        |         unnest(list_distinct(list_transform(
        |           generate_series(1, len(toks) - 4),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                          toks[i+3], toks[i+4])))) AS gram
        |  FROM t WHERE len(toks) >= 5
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |FROM g
        |WHERE nb < 15 AND gram IN (SELECT gram FROM g WHERE nb = 15)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unrolled k-round BPE training chain (the t26/t27 merge loop replayed
    * in SQL: same doubled-separator greedy `replace`, same (count desc,
    * pair asc) argmax — floats never appear, so training replays
    * bit-for-bit). Ends at vocabulary `w{k}` (word, segmentation, count).
    */
  private def bpeChainSql(k: Int): String = {
    def stage(i: Int): String = s""",
      |sym$i AS (
      |  SELECT list_filter(string_split(s, '||'), x -> x <> '') AS sa, wc FROM w${i - 1}
      |), p$i AS (
      |  SELECT p.a AS a, p.b AS b, SUM(wc) AS c FROM (
      |    SELECT unnest([struct_pack(a := sa[i], b := sa[i+1])
      |                   for i in generate_series(1, len(sa) - 1)]) AS p, wc
      |    FROM sym$i WHERE len(sa) >= 2)
      |  GROUP BY 1, 2
      |), t$i AS (
      |  SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1
      |), w$i AS (
      |  SELECT w, replace(w${i - 1}.s, '|' || t$i.a || '||' || t$i.b || '|',
      |                 '|' || t$i.a || t$i.b || '|') AS s, wc
      |  FROM w${i - 1}, t$i
      |)"""
    s"""WITH w0 AS (
      |  SELECT w,
      |         '||' || array_to_string(regexp_split_to_array(w, ''), '||') || '||' AS s,
      |         COUNT(*) AS wc
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE regexp_full_match(w, '[a-z]+')
      |  GROUP BY 1, 2
      |)${(1 to k).map(stage).mkString}""".stripMargin
  }

  private def bpeOracleSql(k: Int): String = {
    val finalSelect = (1 to k)
      .map(i => s"SELECT $i AS rank, a AS lhs, b AS rhs, CAST(c AS BIGINT) AS pair_count FROM t$i")
      .mkString("  ", "\n  UNION ALL ", "")
    s"""${bpeChainSql(k)}
SELECT * FROM (
$finalSelect
) ORDER BY rank"""
  }

  private def bpeEncodeOracleSql(k: Int): String =
    s"""${bpeChainSql(k)},
seg AS (
  SELECT w, list_filter(string_split(s, '||'), x -> x <> '') AS toks FROM w$k
), dw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
       CAST(SUM(list_sum(list_transform(toks,
              t -> CASE WHEN length(t) > 1 THEN length(t) ELSE 0 END)))
            AS BIGINT) AS n_chars_coded
FROM dw JOIN seg USING (w)
GROUP BY doc_id ORDER BY doc_id"""

  def oracleSql: Map[String, String] = Map(
    "t28_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT unnest(toks) AS w FROM t),
        |uc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
        |b AS (SELECT unnest([struct_pack(a := toks[i], b := toks[i+1])
        |                     for i in generate_series(1, len(toks) - 1)]) AS p
        |      FROM t WHERE len(toks) >= 2),
        |bc AS (SELECT p.a AS w1, p.b AS w2, COUNT(*) AS c12
        |       FROM b GROUP BY 1, 2),
        |tot AS (SELECT (SELECT COUNT(*) FROM u) AS n,
        |               (SELECT COUNT(*) FROM b) AS m)
        |SELECT bc.w1, bc.w2, CAST(bc.c12 AS BIGINT) AS c12,
        |       CAST(bc.c12 * tot.n * tot.n // (tot.m * u1.c * u2.c)
        |            AS BIGINT) AS pmi_score
        |FROM bc CROSS JOIN tot
        |JOIN uc u1 ON u1.w = bc.w1
        |JOIN uc u2 ON u2.w = bc.w2
        |WHERE bc.c12 >= 5
        |ORDER BY pmi_score DESC, w1, w2 LIMIT 20""".stripMargin,
    "t26_bpe_merges" -> bpeOracleSql(5),
    "t27_bpe_encode" -> bpeEncodeOracleSql(5),
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
    "a1_multikey_summary" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_registros,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | ROUND(AVG(l_extendedprice), 2) AS avg_price,
        | ROUND(MIN(l_extendedprice), 2) AS min_price,
        | ROUND(MAX(l_extendedprice), 2) AS max_price,
        | ROUND(AVG(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_single_key_stats" ->
      """SELECT c_mktsegment, COUNT(*) AS total_registros,
        | ROUND(AVG(c_acctbal), 2) AS media_acctbal,
        | ROUND(MIN(c_acctbal), 2) AS menor_acctbal,
        | ROUND(MAX(c_acctbal), 2) AS maior_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a3_count_all" -> "SELECT COUNT(*) AS n FROM lineitem",
    "a4_distinct_count" ->
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "a11_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "e9_correlated_sql" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  AND EXISTS (SELECT 1 FROM orders o3
        |              WHERE o3.o_custkey = o.o_custkey
        |                AND o3.o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    "e10_tumbling_window" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start_s,
        |         event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT window_start_s, event_type, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY window_start_s, event_type
        |ORDER BY window_start_s, event_type""".stripMargin,
    "a5_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS total_registros,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        | CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
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
    "a6_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact_parts,
        | TRUE AS approx_within_3rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a10_collect" ->
      """SELECT l_returnflag,
        | array_to_string(list_sort(list(DISTINCT l_linestatus)), '|') AS statuses,
        | CAST(COUNT(l_orderkey) AS INT) AS n_values
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t6_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        | CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        | array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3_sorted,
        | list_contains(toks, 'spark') AS has_spark,
        | CAST(len(list_filter(toks, x -> x NOT IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS n_content_tokens,
        | CAST(list_position(toks, 'spark') AS INT) AS spark_pos
        |FROM t ORDER BY doc_id""".stripMargin,
    "t5_explode_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
        |FROM t, UNNEST(generate_series(1, len(toks))) AS g(i)
        |ORDER BY doc_id, pos""".stripMargin,
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
    "j7_range_join" ->
      """SELECT bucket, COUNT(*) AS n, ROUND(MIN(value), 2) AS min_v, ROUND(MAX(value), 2) AS max_v
        |FROM events
        |JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 300.0), ('high', 300.0, 1000000000.0))
        |  AS b(bucket, lo, hi)
        |ON value >= lo AND value < hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "w_rank_family" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn,
        | RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rnk,
        | DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS drnk
        |FROM lineitem ORDER BY l_orderkey, rn""".stripMargin,
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
    "w_moving_avg" ->
      """SELECT event_id, user_id, value,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE), 2) AS msum_7,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE) / COUNT(*) OVER w7, 4) AS mavg_7
        |FROM events
        |WINDOW w7 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
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
    "j1_broadcast_dim" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "j2_fact_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    "j11_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |       AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "j6_star_join" ->
      """SELECT r_name, COUNT(*) AS n_lines,
        | ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "u1_union_by_name" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey",
    "j8_top_revenue" ->
      """SELECT o_orderkey, o_orderpriority,
        | ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    "p12_null_handling" ->
      """SELECT l_orderkey, l_linenumber,
        | COALESCE(NULLIF(l_returnflag, 'A'), 'FILLED') AS rf_nullable,
        | COALESCE(CASE WHEN l_returnflag = 'A' THEN NULL END, 'C') AS rf_coalesced,
        | CAST(CASE WHEN l_returnflag = 'A' THEN NULL END IS NULL AS INT) AS was_null
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
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
    "w_range_frame" ->
      """SELECT event_id, user_id, value,
        | COUNT(*) OVER wr AS n_in_range,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE), 2) AS sum_in_range
        |FROM events
        |WINDOW wr AS (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
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
    "e45_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), m AS (SELECT SUM(x) // COUNT(*) AS mu FROM daily),
        |dev AS (SELECT day, x - mu AS d FROM daily CROSS JOIN m),
        |den AS (SELECT CAST(SUM(d * d) AS BIGINT) AS den FROM dev),
        |k AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag)
        |SELECT k.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(a.d * b.d) AS BIGINT) AS num,
        |       CAST(MAX(den.den) AS BIGINT) AS den
        |FROM dev a JOIN k ON TRUE JOIN dev b ON b.day = a.day + k.lag
        |CROSS JOIN den
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "a25_crosstab" ->
      """SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "s21_mmr_rerank" ->
      """WITH RECURSIVE q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS uq
        |  FROM embeddings WHERE vec_id = 0
        |), cand AS (
        |  SELECT vec_id, u,
        |    list_sum(list_transform(generate_series(1, 64),
        |      j -> u[j] * uq[j])) AS rel
        |  FROM (SELECT vec_id, list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
        |        FROM embeddings WHERE vec_id <> 0) c CROSS JOIN q
        |  ORDER BY rel DESC, vec_id LIMIT 32
        |), pd AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_sum(list_transform(generate_series(1, 64),
        |      j -> a.u[j] * b.u[j])) AS dot
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        |), sel AS (
        |  SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel,
        |         CAST(0 AS BIGINT) AS pen, [vec_id] AS sel_ids
        |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
        |  UNION ALL
        |  SELECT s.rank + 1, n.vec_id, n.rel, n.pen,
        |         list_append(s.sel_ids, n.vec_id)
        |  FROM sel s, LATERAL (
        |    SELECT x.vec_id, x.rel, x.pen
        |    FROM (SELECT cc.vec_id, cc.rel,
        |            (SELECT MAX(dot) FROM pd
        |             WHERE pd.va = cc.vec_id
        |               AND list_contains(s.sel_ids, pd.vb)) AS pen
        |          FROM cand cc
        |          WHERE NOT list_contains(s.sel_ids, cc.vec_id)) x
        |    ORDER BY x.rel - x.pen DESC, x.vec_id LIMIT 1) n
        |  WHERE s.rank < 10
        |)
        |SELECT rank, vec_id, CAST(rel AS BIGINT) AS rel_dot,
        |       CAST(pen AS BIGINT) AS pen_dot,
        |       CAST(rel - pen AS BIGINT) AS mmr2
        |FROM sel ORDER BY rank""".stripMargin,
    "s22_mmr_diversity" ->
      """WITH RECURSIVE q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS uq
        |  FROM embeddings WHERE vec_id = 0
        |), cand AS (
        |  SELECT vec_id, u,
        |    list_sum(list_transform(generate_series(1, 64),
        |      j -> u[j] * uq[j])) AS rel
        |  FROM (SELECT vec_id, list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
        |        FROM embeddings WHERE vec_id <> 0) c CROSS JOIN q
        |  ORDER BY rel DESC, vec_id LIMIT 32
        |), pd AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_sum(list_transform(generate_series(1, 64),
        |      j -> a.u[j] * b.u[j])) AS dot
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        |), sel AS (
        |  SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel,
        |         CAST(0 AS BIGINT) AS pen, [vec_id] AS sel_ids
        |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
        |  UNION ALL
        |  SELECT s.rank + 1, n.vec_id, n.rel, n.pen,
        |         list_append(s.sel_ids, n.vec_id)
        |  FROM sel s, LATERAL (
        |    SELECT x.vec_id, x.rel, x.pen
        |    FROM (SELECT cc.vec_id, cc.rel,
        |            (SELECT MAX(dot) FROM pd
        |             WHERE pd.va = cc.vec_id
        |               AND list_contains(s.sel_ids, pd.vb)) AS pen
        |          FROM cand cc
        |          WHERE NOT list_contains(s.sel_ids, cc.vec_id)) x
        |    ORDER BY x.rel - x.pen DESC, x.vec_id LIMIT 1) n
        |  WHERE s.rank < 10
        |), topk AS (
        |  SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 10
        |), tp AS (
        |  SELECT CAST(SUM(pd.dot) AS BIGINT) AS topk_pair_dot_sum
        |  FROM pd JOIN topk a ON pd.va = a.vec_id
        |          JOIN topk b ON pd.vb = b.vec_id
        |  WHERE pd.va < pd.vb
        |), mp AS (
        |  SELECT CAST(SUM(pd.dot) AS BIGINT) AS mmr_pair_dot_sum
        |  FROM pd JOIN sel a ON pd.va = a.vec_id
        |          JOIN sel b ON pd.vb = b.vec_id
        |  WHERE pd.va < pd.vb
        |)
        |SELECT topk_pair_dot_sum, mmr_pair_dot_sum,
        |       mmr_pair_dot_sum < topk_pair_dot_sum AS mmr_more_diverse
        |FROM tp CROSS JOIN mp""".stripMargin,
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
    "e46_period_over_period" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
        |           AS mk,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT m.mk // 12 AS yr, m.mk % 12 + 1 AS mo, m.cents,
        |       p.cents AS prev_cents, y.cents AS yoy_cents,
        |       CAST((m.cents - p.cents) * 1000 // p.cents AS BIGINT)
        |         AS mom_permille,
        |       CAST((m.cents - y.cents) * 1000 // y.cents AS BIGINT)
        |         AS yoy_permille
        |FROM monthly m
        |LEFT JOIN monthly p ON p.mk = m.mk - 1
        |LEFT JOIN monthly y ON y.mk = m.mk - 12
        |ORDER BY 1, 2""".stripMargin,
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
    "e47_ewma" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), k AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS i)
        |SELECT a.day, a.x, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(b.x * (CAST(1 AS BIGINT) << CAST(9 - k.i AS INT)))
        |       AS BIGINT) AS ewma_num,
        |  CAST(SUM(CAST(1 AS BIGINT) << CAST(9 - k.i AS INT)) AS BIGINT)
        |    AS wt_den
        |FROM daily a JOIN k ON TRUE JOIN daily b ON b.day = a.day - k.i
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "d25_sorted_neighborhood" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
        |      AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |)
        |SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
        |  GREATEST(a.doc_id, b.doc_id) AS doc_b,
        |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
        |FROM r a JOIN r b
        |  ON b.blk = a.blk
        | AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |WHERE levenshtein(a.k, b.k) <= 8
        |ORDER BY 1, 2""".stripMargin,
    "e48_kaplan_meier" ->
      """WITH pc AS (
        |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
        |         MAX(CAST(o_orderdate AS DATE)) AS last_d
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        |), h AS (
        |  SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders
        |), obs AS (
        |  SELECT CAST(last_d - first_d AS BIGINT) AS t,
        |         CASE WHEN max_d - last_d > 365 THEN 1 ELSE 0 END AS churned
        |  FROM pc CROSS JOIN h
        |), byt AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at_t,
        |         CAST(SUM(churned) AS BIGINT) AS d_events
        |  FROM obs GROUP BY 1
        |)
        |SELECT t,
        |  CAST(SUM(n_at_t) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_risk,
        |  d_events, n_at_t - d_events AS n_censored_at_t
        |FROM byt QUALIFY d_events > 0 ORDER BY t""".stripMargin,
    "d26_temporal_split" ->
      """WITH d AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        |), s AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
        |spec AS (
        |  SELECT CAST(unnest(range(1, 5)) AS BIGINT) AS fold, d0, d1,
        |         (d1 - d0 + 1) // 5 AS width
        |  FROM s
        |), f AS (
        |  SELECT fold, d0 + fold * width AS train_end_day,
        |         d0 + fold * width + 7 AS test_start_day,
        |         d0 + (fold + 1) * width AS test_end_day
        |  FROM spec
        |)
        |SELECT fold, train_end_day, test_start_day, test_end_day,
        |  CAST(SUM(CASE WHEN day < train_end_day THEN c ELSE 0 END)
        |       AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN day >= test_start_day AND day < test_end_day
        |                THEN c ELSE 0 END) AS BIGINT) AS n_test
        |FROM d CROSS JOIN f
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "d27_target_encoding" ->
      """WITH f AS (
        |  SELECT n.n_name, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE o.o_totalprice IS NOT NULL
        |), g AS (
        |  SELECT CAST(SUM(cents) AS BIGINT) AS gsum,
        |         CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM f
        |)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_c,
        |  CAST(SUM(cents) AS BIGINT) AS sum_c,
        |  CAST(SUM(cents) // COUNT(*) AS BIGINT) AS raw_mean_cents,
        |  CAST((SUM(cents) + 20 * (MAX(gsum) // MAX(gn)))
        |       // (COUNT(*) + 20) AS BIGINT) AS enc_cents,
        |  CAST(MAX(gsum) // MAX(gn) AS BIGINT) AS global_mean_cents
        |FROM f CROSS JOIN g
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d28_blocking_eval" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt,
        |    substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
        |      AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |), cand AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
        |         GREATEST(a.doc_id, b.doc_id) AS doc_b
        |  FROM r a JOIN r b
        |    ON b.blk = a.blk
        |   AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |), tp AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM keyed x JOIN keyed y
        |    ON x.nt = y.nt AND x.doc_id < y.doc_id
        |), c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM tp),
        |cap AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_captured
        |  FROM tp JOIN cand USING (doc_a, doc_b)
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM documents)
        |SELECT n_records,
        |  n_records * (n_records - 1) // 2 AS n_total_pairs,
        |  n_candidates, n_true_pairs, n_captured,
        |  n_captured * 1000 // NULLIF(n_true_pairs, 0)
        |    AS completeness_permille,
        |  (n_records * (n_records - 1) // 2 - n_candidates) * 1000
        |    // NULLIF(n_records * (n_records - 1) // 2, 0)
        |    AS reduction_permille
        |FROM n CROSS JOIN c CROSS JOIN t CROSS JOIN cap""".stripMargin,
    "e49_linear_interp" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), spine AS (
        |  SELECT CAST(unnest(range(MIN(day), MAX(day) + 1)) AS BIGINT) AS day
        |  FROM daily
        |), j AS (
        |  SELECT s.day, d.x,
        |    LAST_VALUE(CASE WHEN d.x IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
        |    LAST_VALUE(d.x IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS x_p,
        |    FIRST_VALUE(CASE WHEN d.x IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS q,
        |    FIRST_VALUE(d.x IGNORE NULLS)
        |      OVER (ORDER BY s.day
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS x_q
        |  FROM spine s LEFT JOIN daily d USING (day)
        |)
        |SELECT day, p, q,
        |  CAST(x_p * (q - day) + x_q * (day - p) AS BIGINT) AS interp_num,
        |  CAST(q - p AS BIGINT) AS gap_den
        |FROM j
        |WHERE x IS NULL AND p IS NOT NULL AND q IS NOT NULL
        |ORDER BY day""".stripMargin,
    "p15_bitwise_battery" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(bit_and(o_orderkey) AS BIGINT) AS band,
        |  CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
        |  CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor,
        |  CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS sum_popcount,
        |  CAST(MAX(bit_count(o_orderkey)) AS BIGINT) AS max_popcount
        |FROM orders WHERE o_orderkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "e50_decay_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS pus,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type = 'purchase' AND value IS NOT NULL
        |), t AS (
        |  SELECT user_id, event_id AS t_id, epoch_us(ts) AS tus,
        |         event_type AS t_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('click', 'view')
        |), j AS (
        |  SELECT p.p_id, p.v, t.t_id, t.tus, t.t_type,
        |    (CAST(1 AS BIGINT)
        |     << CAST(2 - (p.pus - t.tus) // 86400000000 AS INT)) AS w
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.tus < p.pus AND p.pus - t.tus < 3 * 86400000000
        |), c AS (
        |  SELECT t_type,
        |    v * w // SUM(w) OVER (PARTITION BY p_id)
        |      + CASE WHEN row_number() OVER (PARTITION BY p_id
        |                                     ORDER BY tus DESC, t_id DESC) = 1
        |             THEN v - SUM(v * w // wtot) OVER (PARTITION BY p_id)
        |             ELSE 0 END AS credit
        |  FROM (SELECT *, SUM(w) OVER (PARTITION BY p_id) AS wtot FROM j)
        |), u AS (
        |  SELECT 'unattributed' AS t_type, v AS credit
        |  FROM p WHERE p_id NOT IN (SELECT p_id FROM j)
        |), allc AS (SELECT * FROM c UNION ALL SELECT * FROM u)
        |SELECT t_type, CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(credit) AS BIGINT) AS credited_cents
        |FROM allc GROUP BY 1 ORDER BY 1""".stripMargin,
    "d29_referential_sample" ->
      """WITH ko AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE strpos('0123456789abcdef',
        |          substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1 < 4
        |), kl AS (
        |  SELECT l_orderkey FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM ko)
        |), oc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders),
        |okc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_kept FROM ko),
        |lc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem),
        |lkc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lines_kept FROM kl),
        |orp AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_lines
        |  FROM kl WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ko)
        |)
        |SELECT n_orders, n_orders_kept,
        |  n_orders_kept * 1000 // NULLIF(n_orders, 0) AS orders_permille,
        |  n_lines, n_lines_kept,
        |  n_lines_kept * 1000 // NULLIF(n_lines, 0) AS lines_permille,
        |  n_orphan_lines
        |FROM oc CROSS JOIN okc CROSS JOIN lc CROSS JOIN lkc
        |CROSS JOIN orp""".stripMargin,
    "d30_snm_multipass" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt
        |  FROM documents
        |), fk AS (
        |  SELECT doc_id, substring(nt, 1, 24) AS k FROM keyed
        |), fr AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM fk
        |), fp AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
        |         GREATEST(a.doc_id, b.doc_id) AS doc_b
        |  FROM fr a JOIN fr b
        |    ON b.blk = a.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |  WHERE levenshtein(a.k, b.k) <= 8
        |), rk AS (
        |  SELECT doc_id, substring(reverse(nt), 1, 24) AS k FROM keyed
        |), rr AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM rk
        |), rp AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
        |         GREATEST(a.doc_id, b.doc_id) AS doc_b
        |  FROM rr a JOIN rr b
        |    ON b.blk = a.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |  WHERE levenshtein(a.k, b.k) <= 8
        |), u AS (
        |  SELECT doc_a, doc_b, 1 AS f, 0 AS r FROM fp
        |  UNION ALL
        |  SELECT doc_a, doc_b, 0 AS f, 1 AS r FROM rp
        |)
        |SELECT doc_a, doc_b, CAST(MAX(f) AS BIGINT) AS in_fwd,
        |  CAST(MAX(r) AS BIGINT) AS in_rev
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
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
    "d31_encoding_merge" ->
      """WITH f AS (
        |  SELECT n.n_name, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE o.o_totalprice IS NOT NULL
        |), g AS (
        |  SELECT CAST(SUM(cents) AS BIGINT) AS gsum,
        |         CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM f
        |)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_c,
        |  CAST(SUM(cents) AS BIGINT) AS sum_c,
        |  CAST(SUM(cents) // COUNT(*) AS BIGINT) AS raw_mean_cents,
        |  CAST((SUM(cents) + 20 * (MAX(gsum) // MAX(gn)))
        |       // (COUNT(*) + 20) AS BIGINT) AS enc_cents,
        |  CAST(MAX(gsum) // MAX(gn) AS BIGINT) AS global_mean_cents
        |FROM f CROSS JOIN g
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e51_ltv_triangle" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_totalprice IS NOT NULL
        |), f AS (SELECT o_custkey, MIN(day) AS d0 FROM o GROUP BY 1),
        |sz AS (
        |  SELECT d0 // 7 AS cohort_wk, CAST(COUNT(*) AS BIGINT)
        |    AS cohort_size
        |  FROM f GROUP BY 1
        |), cells AS (
        |  SELECT f.d0 // 7 AS cohort_wk, (o.day - f.d0) // 7 AS weeks_since,
        |    CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |    CAST(SUM(o.cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN f USING (o_custkey)
        |  WHERE (o.day - f.d0) // 7 < 12
        |  GROUP BY 1, 2
        |), c2 AS (
        |  SELECT cohort_wk, weeks_since, n_active, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_wk
        |      ORDER BY weeks_since
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_rev_cents
        |  FROM cells
        |)
        |SELECT c2.cohort_wk, weeks_since, n_active, rev_cents,
        |  cum_rev_cents, cohort_size,
        |  cum_rev_cents // cohort_size AS ltv_cents
        |FROM c2 JOIN sz ON c2.cohort_wk = sz.cohort_wk
        |ORDER BY 1, 2""".stripMargin,
    "g12_assortativity" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e0 AS (
        |  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2
        |), eu AS (SELECT u, v FROM e0 WHERE c >= 2),
        |d AS (
        |  SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS x FROM eu UNION ALL SELECT v AS x FROM eu)
        |  GROUP BY x
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        |  CAST(SUM(du.deg + dv.deg) AS BIGINT) AS s1,
        |  CAST(SUM(CAST(du.deg AS HUGEINT) * du.deg
        |           + CAST(dv.deg AS HUGEINT) * dv.deg) AS BIGINT) AS s2,
        |  CAST(SUM(CAST(du.deg AS HUGEINT) * dv.deg) AS BIGINT) AS s3
        |FROM eu
        |JOIN d du ON du.node = eu.u
        |JOIN d dv ON dv.node = eu.v""".stripMargin,
    "d32_bag_jaccard" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
        |      AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |), pairs AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
        |    GREATEST(a.doc_id, b.doc_id) AS doc_b
        |  FROM r a JOIN r b
        |    ON b.blk = a.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |  WHERE levenshtein(a.k, b.k) <= 8
        |), tc AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), sz AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS sz FROM tc GROUP BY 1
        |), im AS (
        |  SELECT p.doc_a, p.doc_b, CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS m
        |  FROM pairs p
        |  JOIN tc a ON a.doc_id = p.doc_a
        |  JOIN tc b ON b.doc_id = p.doc_b AND b.tok = a.tok
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b,
        |  COALESCE(im.m, 0) AS jac_num,
        |  sa.sz + sb.sz - COALESCE(im.m, 0) AS jac_den
        |FROM pairs p
        |LEFT JOIN im ON im.doc_a = p.doc_a AND im.doc_b = p.doc_b
        |JOIN sz sa ON sa.doc_id = p.doc_a
        |JOIN sz sb ON sb.doc_id = p.doc_b
        |ORDER BY 1, 2""".stripMargin,
    "e52_adoption_curve" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), npd AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users
        |  FROM (SELECT user_id, MIN(day) AS day FROM base GROUP BY 1)
        |  GROUP BY 1
        |), epd AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM base GROUP BY 1
        |)
        |SELECT e.day, e.n_events,
        |  COALESCE(n.n_new_users, 0) AS n_new_users,
        |  CAST(SUM(COALESCE(n.n_new_users, 0)) OVER (ORDER BY e.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM epd e LEFT JOIN npd n ON n.day = e.day
        |ORDER BY e.day""".stripMargin,
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
    "d33_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(FLOOR(sqrt(COUNT(*))) AS BIGINT) AS w
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1
        |), x AS (
        |  SELECT lang, n_docs, w,
        |    CAST(SUM(w) OVER () AS BIGINT) AS wsum
        |  FROM c
        |), y AS (
        |  SELECT lang, n_docs, w,
        |    w * 10000 // wsum AS base,
        |    w * 10000 % wsum AS rem,
        |    10000 - CAST(SUM(w * 10000 // wsum) OVER () AS BIGINT) AS short,
        |    row_number() OVER (ORDER BY w * 10000 % wsum DESC, lang) AS rk
        |  FROM x
        |)
        |SELECT lang, n_docs, w,
        |  CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
        |    AS allocation
        |FROM y ORDER BY lang""".stripMargin,
    "e53_rev_recognition" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), k AS (SELECT CAST(unnest(range(0, 30)) AS BIGINT) AS i)
        |SELECT d.day + k.i AS rec_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_source_days,
        |  CAST(SUM(CASE WHEN k.i < 29 THEN d.v // 30
        |                ELSE d.v - 29 * (d.v // 30) END) AS BIGINT)
        |    AS recognized_cents
        |FROM daily d JOIN k ON TRUE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "d34_snm_clusters" ->
      """WITH RECURSIVE keyed AS (
        |  SELECT doc_id,
        |    substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
        |      AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |), p AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS u,
        |    GREATEST(a.doc_id, b.doc_id) AS v
        |  FROM r a JOIN r b
        |    ON b.blk = a.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |  WHERE levenshtein(a.k, b.k) <= 8
        |), e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |cc AS (
        |  SELECT u AS node, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM cc JOIN e ON cc.node = e.u WHERE cc.lbl < e.v
        |)
        |SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM cc GROUP BY node
        |ORDER BY doc_id""".stripMargin,
    "g13_cc_incremental" ->
      """WITH RECURSIVE op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e0 AS (
        |  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2
        |), eu AS (SELECT u, v FROM e0 WHERE c >= 2),
        |e AS (SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu),
        |cc AS (
        |  SELECT u AS node, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM cc JOIN e ON cc.node = e.u WHERE cc.lbl < e.v
        |)
        |SELECT node, MIN(lbl) AS component FROM cc GROUP BY node
        |ORDER BY node""".stripMargin,
    "e54_daily_percentiles" ->
      """WITH counts AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT day, cents,
        |    SUM(cnt) OVER (PARTITION BY day ORDER BY cents) AS cum,
        |    SUM(cnt) OVER (PARTITION BY day) AS n
        |  FROM counts
        |)
        |SELECT day, CAST(MAX(n) AS BIGINT) AS n_events,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 50 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 90 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p90_cents,
        |  CAST(MIN(CASE WHEN cum >= (n - 1) * 99 // 100 + 1 THEN cents END)
        |       AS BIGINT) AS p99_cents
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,
    "e55_open_orders" ->
      """WITH shipped AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT))
        |      AS last_ship
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
        |), spans AS (
        |  SELECT o.o_orderkey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS opened,
        |    s.last_ship
        |  FROM orders o JOIN shipped s USING (o_orderkey)
        |  WHERE o.o_orderdate IS NOT NULL
        |), deltas AS (
        |  SELECT day, CAST(SUM(od) AS BIGINT) AS n_opened,
        |         CAST(SUM(cd) AS BIGINT) AS n_closed
        |  FROM (
        |    SELECT opened AS day, 1 AS od, 0 AS cd FROM spans
        |    UNION ALL
        |    SELECT last_ship + 1 AS day, 0 AS od, 1 AS cd FROM spans
        |  ) GROUP BY 1
        |)
        |SELECT day, n_opened, n_closed,
        |  CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS open_backlog
        |FROM deltas ORDER BY day""".stripMargin,
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
    "d35_split_leakage" ->
      """WITH RECURSIVE keyed AS (
        |  SELECT doc_id,
        |    substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
        |      AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, k, substring(k, 1, 1) AS blk,
        |    row_number() OVER (PARTITION BY substring(k, 1, 1)
        |                       ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |), p AS (
        |  SELECT LEAST(a.doc_id, b.doc_id) AS u,
        |    GREATEST(a.doc_id, b.doc_id) AS v
        |  FROM r a JOIN r b
        |    ON b.blk = a.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 4
        |  WHERE levenshtein(a.k, b.k) <= 8
        |), e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |cc AS (
        |  SELECT u AS node, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM cc JOIN e ON cc.node = e.u WHERE cc.lbl < e.v
        |), cl AS (
        |  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM cc GROUP BY node
        |), sided AS (
        |  SELECT cluster_id,
        |    CASE WHEN strpos('0123456789abcdef',
        |           substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 8
        |         THEN 1 ELSE 0 END AS is_train
        |  FROM cl
        |), pc AS (
        |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(is_train) AS BIGINT) AS n_train
        |  FROM sided GROUP BY 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_clustered_docs,
        |  CAST(SUM(CASE WHEN n_train > 0 AND n_train < n_docs
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_clusters,
        |  CAST(SUM(CASE WHEN n_train > 0 AND n_train < n_docs
        |                THEN n_docs ELSE 0 END) AS BIGINT) AS n_leaky_docs
        |FROM pc""".stripMargin,
    "d36_normalization_funnel" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw,
        |  CAST(COUNT(DISTINCT lower(text)) AS BIGINT) AS n_casefold,
        |  CAST(COUNT(DISTINCT regexp_replace(trim(lower(text)),
        |       '\s+', ' ', 'g')) AS BIGINT) AS n_wscollapse,
        |  CAST(COUNT(DISTINCT regexp_replace(lower(text),
        |       '[^a-z0-9]', '', 'g')) AS BIGINT) AS n_alnum
        |FROM documents""".stripMargin,
    "e56_fiscal_calendar" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |      // 7 AS wk
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND CAST(o_orderdate AS DATE) >= DATE '1992-01-01'
        |), p AS (
        |  SELECT cents, wk // 52 AS fiscal_year,
        |    (wk % 52) // 13 * 3
        |      + CASE WHEN (wk % 52) % 13 < 4 THEN 1
        |             WHEN (wk % 52) % 13 < 8 THEN 2 ELSE 3 END
        |      AS fiscal_period
        |  FROM b
        |)
        |SELECT fiscal_year, fiscal_period,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS rev_cents
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t42_vocab_growth" ->
      """WITH fd AS (
        |  SELECT toks[i] || ' ' || toks[i + 1] AS tok,
        |         MIN(doc_id) AS first_doc
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |       UNNEST(range(1, len(toks))) AS t(i)
        |  GROUP BY 1
        |), b AS (
        |  SELECT CASE WHEN first_doc <= 50 THEN 50
        |              WHEN first_doc <= 100 THEN 100
        |              WHEN first_doc <= 200 THEN 200
        |              WHEN first_doc <= 500 THEN 500
        |              WHEN first_doc <= 1000 THEN 1000
        |              WHEN first_doc <= 2000 THEN 2000
        |              WHEN first_doc <= 5000 THEN 5000
        |         END AS checkpoint
        |  FROM fd
        |)
        |SELECT CAST(checkpoint AS BIGINT) AS checkpoint,
        |  CAST(COUNT(*) AS BIGINT) AS n_new_tokens,
        |  CAST(SUM(COUNT(*)) OVER (ORDER BY checkpoint
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_size
        |FROM b WHERE checkpoint IS NOT NULL
        |GROUP BY checkpoint ORDER BY checkpoint""".stripMargin,
    "e57_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY 1),
        |cls AS (
        |  SELECT uw.wk,
        |    CASE WHEN uw.wk = f.first_wk THEN 'new'
        |         WHEN p.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS cls
        |  FROM uw
        |  JOIN f USING (user_id)
        |  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.wk = uw.wk - 1
        |), act AS (
        |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_resurrected
        |  FROM cls GROUP BY 1
        |), ch AS (
        |  SELECT a.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM uw a
        |  LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1
        |  WHERE b.user_id IS NULL
        |  GROUP BY 1
        |)
        |SELECT act.wk, n_active, n_new, n_retained, n_resurrected,
        |  COALESCE(ch.n_churned, 0) AS n_churned
        |FROM act LEFT JOIN ch ON ch.wk = act.wk
        |ORDER BY act.wk""".stripMargin,
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
    "s23_margin_stats" ->
      """WITH u AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, u AS uq FROM u
        |  WHERE vec_id IN (0, 1, 2, 3, 4)
        |), s AS (
        |  SELECT q.query_id, c.vec_id,
        |    list_sum(list_transform(generate_series(1, len(c.u)),
        |      j -> c.u[j] * q.uq[j])) AS dot
        |  FROM u c CROSS JOIN q WHERE c.vec_id <> q.query_id
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, vec_id) AS rk
        |  FROM s
        |)
        |SELECT query_id,
        |  MAX(CASE WHEN rk = 1 THEN vec_id END) AS top1_id,
        |  CAST(MAX(CASE WHEN rk = 1 THEN dot END) AS BIGINT) AS top1_dot,
        |  MAX(CASE WHEN rk = 2 THEN vec_id END) AS top2_id,
        |  CAST(MAX(CASE WHEN rk = 2 THEN dot END) AS BIGINT) AS top2_dot,
        |  CAST(MAX(CASE WHEN rk = 1 THEN dot END)
        |       - MAX(CASE WHEN rk = 2 THEN dot END) AS BIGINT) AS margin
        |FROM r WHERE rk <= 2 GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "e58_weekday_anova" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day,
        |         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), d2 AS (SELECT day % 7 AS dow, x FROM daily),
        |g AS (
        |  SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM d2
        |), gr AS (
        |  SELECT dow, CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu_g,
        |         CAST(COUNT(*) AS BIGINT) AS n_g
        |  FROM d2 GROUP BY 1
        |), sst AS (
        |  SELECT CAST(SUM((x - mu) * (x - mu)) AS BIGINT) AS sst,
        |         MAX(n) AS n_days
        |  FROM d2 CROSS JOIN g
        |), ssb AS (
        |  SELECT CAST(SUM(n_g * (mu_g - mu) * (mu_g - mu)) AS BIGINT) AS ssb
        |  FROM gr CROSS JOIN g
        |)
        |SELECT n_days, ssb, sst,
        |  ssb * 1000 // NULLIF(sst, 0) AS eta2_permille
        |FROM sst CROSS JOIN ssb""".stripMargin,
    "e59_stickiness" ->
      """WITH base AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), ds AS (
        |  SELECT day // 7 AS wk, CAST(COUNT(*) AS BIGINT) AS dau_sum
        |  FROM base GROUP BY 1
        |), w AS (
        |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM (SELECT DISTINCT user_id, day // 7 AS wk FROM base)
        |  GROUP BY 1
        |)
        |SELECT ds.wk, dau_sum, wau,
        |  dau_sum * 1000 // (7 * wau) AS stickiness_permille
        |FROM ds JOIN w ON ds.wk = w.wk
        |ORDER BY ds.wk""".stripMargin,
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
    "o_topk" ->
      "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    // LLM tier (d3/d4/d5/s2 are hash-seeded — not SQL-expressible, rows-only;
    // d3b IS oracle-compared: at threshold 0.9 LSH recall ≈ 0.9998, so the
    // banded engine result equals DuckDB's exact all-pairs Jaccard. The
    // size-ratio prefilter is a necessary condition for the ROUNDED
    // threshold round(J,4) ≥ 0.9 ⇔ J ≥ 0.89995 (J ≤ min/max of
    // distinct-shingle counts, hence ratio ≥ 0.8999 with slack) — it only
    // prunes pairs the threshold would reject, keeping the quadratic
    // oracle tractable.)
    "d3b_minhash_highsim" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
        |          / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |   AND len(a.sh) * 10000 >= len(b.sh) * 8999 AND len(b.sh) * 10000 >= len(a.sh) * 8999
        |)
        |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "s4_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding) AS x,
        |         unnest(generate_series(1, len(embedding))) AS d
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL
        |)
        |SELECT label, CAST(d - 1 AS INT) AS dim,
        |       CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        |            // COUNT(*) AS BIGINT) AS centroid_scaled
        |FROM e GROUP BY label, d ORDER BY label, dim""".stripMargin,
    "s7_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xs,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
        |), s AS (
        |  SELECT label, unnest(xs) AS v,
        |         unnest(generate_series(1, len(xs))) AS d
        |  FROM e WHERE nb < 8
        |), cdim AS (
        |  SELECT label, d, CAST(SUM(v) // COUNT(*) AS BIGINT) AS cv
        |  FROM s GROUP BY label, d
        |), cent AS (
        |  SELECT label, list(cv ORDER BY d) AS c FROM cdim GROUP BY label
        |), dist AS (
        |  SELECT e.label, e.nb,
        |    CAST(list_sum(list_transform(generate_series(1, len(e.xs)),
        |      i -> (e.xs[i] - cent.c[i]) * (e.xs[i] - cent.c[i]))) AS BIGINT) AS dist2
        |  FROM e LEFT JOIN cent USING (label)
        |), agg AS (
        |  SELECT label,
        |    COUNT(*) FILTER (nb < 8) AS n_ref,
        |    CAST(SUM(dist2) FILTER (nb < 8) AS BIGINT) AS sum_ref,
        |    COUNT(*) FILTER (nb >= 8) AS n_cand,
        |    CAST(SUM(dist2) FILTER (nb >= 8) AS BIGINT) AS sum_cand
        |  FROM dist GROUP BY label
        |)
        |SELECT label, n_ref,
        |  CAST(sum_ref // NULLIF(n_ref, 0) AS BIGINT) AS mean_ref_d2,
        |  n_cand,
        |  CAST(sum_cand // NULLIF(n_cand, 0) AS BIGINT) AS mean_cand_d2,
        |  CAST((sum_cand // NULLIF(n_cand, 0)) * 1000
        |       // NULLIF(sum_ref // NULLIF(n_ref, 0), 0) AS BIGINT) AS drift_permille
        |FROM agg ORDER BY label""".stripMargin,
    "s5_nearest_centroid" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xs
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), s AS (
        |  SELECT label, unnest(xs) AS v,
        |         unnest(generate_series(1, len(xs))) AS d
        |  FROM e WHERE label IS NOT NULL
        |), cdim AS (
        |  SELECT label AS c_label, d, CAST(SUM(v) // COUNT(*) AS BIGINT) AS cv
        |  FROM s GROUP BY label, d
        |), cent AS (
        |  SELECT c_label, list(cv ORDER BY d) AS c FROM cdim GROUP BY c_label
        |), dist AS (
        |  SELECT e.vec_id, cent.c_label,
        |    CAST(list_sum(list_transform(generate_series(1, len(e.xs)),
        |      i -> (e.xs[i] - cent.c[i]) * (e.xs[i] - cent.c[i]))) AS BIGINT) AS dist2
        |  FROM e, cent
        |)
        |SELECT vec_id, c_label AS label_assigned, dist2
        |FROM dist
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) = 1
        |ORDER BY vec_id""".stripMargin,
    "d10_incremental_dedup" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |  instr('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, nb, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT n.doc_id AS new_doc, c.doc_id AS corpus_doc,
        |    ROUND(len(list_intersect(n.sh, c.sh)) * 1.0
        |          / len(list_distinct(list_concat(n.sh, c.sh))), 4) AS jaccard
        |  FROM s n JOIN s c ON n.nb >= 12 AND c.nb < 12
        |   AND len(n.sh) * 10000 >= len(c.sh) * 8999 AND len(c.sh) * 10000 >= len(n.sh) * 8999
        |)
        |SELECT new_doc, corpus_doc, jaccard FROM p WHERE jaccard >= 0.9
        |ORDER BY new_doc, corpus_doc""".stripMargin,
    "d8b_training_prep_decon" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text, lang, string_split(text, ' ') AS toks,
        |         length(text) AS nc
        |  FROM documents
        |  WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 12
        |), c AS (
        |  SELECT doc_id, text, lang, nc, toks, CAST(len(toks) AS INT) AS nt,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
        |   CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
        |  FROM base
        |), q AS (
        |  SELECT doc_id, text, lang, nt, toks,
        |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
        |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS score,
        |    CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS plang
        |  FROM c
        |), qq AS (
        |  SELECT doc_id, text, lang, nt, toks FROM q
        |  WHERE score >= 3 AND plang = 'en'
        |), tg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(toks)-4),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS gram
        |  FROM qq WHERE len(toks) >= 5
        |), evt AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 = 15
        |), evg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    generate_series(1, len(toks)-4),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS gram
        |  FROM evt WHERE len(toks) >= 5
        |), bad AS (
        |  SELECT DISTINCT doc_id FROM tg WHERE gram IN (SELECT gram FROM evg)
        |), d AS (
        |  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
        |         text, min(nt) AS nt
        |  FROM qq WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |  GROUP BY text
        |), s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
        |    THEN list_transform(generate_series(1, len(string_split(text, ' '))-2),
        |         i -> concat_ws(' ', string_split(text, ' ')[i],
        |              string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM d
        |), p AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |   AND len(a.sh) * 10000 >= len(b.sh) * 8999 AND len(b.sh) * 10000 >= len(a.sh) * 8999
        |  WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.9
        |), e AS (
        |  SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p
        |), cc AS (
        |  SELECT doc_id AS node, doc_id AS label FROM d
        |  UNION
        |  SELECT e.b AS node, cc.label FROM cc JOIN e ON cc.node = e.a
        |), lab AS (
        |  SELECT node, min(label) AS lbl FROM cc GROUP BY node
        |), reps AS (
        |  SELECT d.doc_id, d.lang, CAST(d.nt AS INT) AS n_tokens
        |  FROM d JOIN lab ON d.doc_id = lab.node
        |  WHERE lab.lbl = d.doc_id
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       - n_tokens) / 512) AS INT) AS chunk_id
        |FROM reps ORDER BY doc_id""".stripMargin,
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
    // Connected components as a recursive min-label closure: edges are the
    // exact all-pairs J ≥ 0.9 pairs (same derivation as d3b, both
    // directions), the recursive CTE enumerates every (node, reachable
    // label), and min per node is the component id. Tractable because the
    // sf0.01 edge set is tiny; the ENGINE side is the one that has to be
    // subquadratic (LSH edges + O(log² n) star rounds).
    "d7_dup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |   AND len(a.sh) * 10000 >= len(b.sh) * 8999 AND len(b.sh) * 10000 >= len(a.sh) * 8999
        |  WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.9
        |), e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p
        |), cc AS (
        |  SELECT doc_id AS node, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.b AS node, cc.label FROM cc JOIN e ON cc.node = e.a
        |), lab AS (
        |  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
        |), sz AS (
        |  SELECT cluster_id, CAST(COUNT(*) AS INT) AS cluster_size
        |  FROM lab GROUP BY cluster_id
        |)
        |SELECT lab.node AS doc_id, lab.cluster_id, sz.cluster_size
        |FROM lab JOIN sz USING (cluster_id)
        |ORDER BY doc_id""".stripMargin,
    "d16_cluster_reps" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |   AND len(a.sh) * 10000 >= len(b.sh) * 8999 AND len(b.sh) * 10000 >= len(a.sh) * 8999
        |  WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.9
        |), e AS (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p
        |), cc AS (
        |  SELECT doc_id AS node, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.b AS node, cc.label FROM cc JOIN e ON cc.node = e.a
        |), lab AS (
        |  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
        |), q AS (
        |  SELECT doc_id,
        |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
        |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS quality_score
        |  FROM (
        |    SELECT doc_id, length(text) AS nc, CAST(len(toks) AS INT) AS nt,
        |      CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
        |      CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
        |    FROM t
        |  )
        |), sel AS (
        |  SELECT l.cluster_id, l.node AS doc_id, q.quality_score,
        |         COUNT(*) OVER (PARTITION BY l.cluster_id) AS csize
        |  FROM lab l JOIN q ON q.doc_id = l.node
        |)
        |SELECT cluster_id, doc_id AS rep_doc, quality_score AS rep_quality,
        |       CAST(csize AS BIGINT) AS cluster_size
        |FROM sel
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id
        |                           ORDER BY quality_score DESC, doc_id) = 1
        |ORDER BY cluster_id""".stripMargin,
    "s3_knn_join" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
        |          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |             * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> q.query_id
        |)
        |SELECT query_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rank, vec_id, score
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, vec_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "s10_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
        |          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |             * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> q.query_id
        |)
        |SELECT query_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rank, vec_id, score
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, vec_id)
        |QUALIFY ROW_NUMBER() OVER w > 5 AND ROW_NUMBER() OVER w <= 15
        |ORDER BY query_id, rank""".stripMargin,
    "s11_kmeans" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), ed AS (
        |  SELECT vec_id, d, qe[d + 1] AS v
        |  FROM e, unnest(generate_series(0, len(qe) - 1)) AS g(d)
        |), c0 AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |                            vec_id) - 1 AS cid, qe
        |  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
        |), c0d AS (
        |  SELECT cid, d, qe[d + 1] AS v
        |  FROM c0, unnest(generate_series(0, len(qe) - 1)) AS g(d)
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT ed.vec_id, c.cid, SUM((ed.v - c.v) * (ed.v - c.v)) AS dist
        |    FROM ed JOIN c0d c ON ed.d = c.d GROUP BY ed.vec_id, c.cid)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |                             ORDER BY dist, cid) = 1
        |), u1 AS (
        |  SELECT a1.cid, ed.d, CAST(SUM(ed.v) AS BIGINT) // COUNT(*) AS v
        |  FROM a1 JOIN ed USING (vec_id) GROUP BY a1.cid, ed.d
        |), c1d AS (
        |  SELECT c.cid, c.d, COALESCE(u1.v, c.v) AS v
        |  FROM c0d c LEFT JOIN u1 ON u1.cid = c.cid AND u1.d = c.d
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT ed.vec_id, c.cid, SUM((ed.v - c.v) * (ed.v - c.v)) AS dist
        |    FROM ed JOIN c1d c ON ed.d = c.d GROUP BY ed.vec_id, c.cid)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |                             ORDER BY dist, cid) = 1
        |), u2 AS (
        |  SELECT a2.cid, ed.d, CAST(SUM(ed.v) AS BIGINT) // COUNT(*) AS v
        |  FROM a2 JOIN ed USING (vec_id) GROUP BY a2.cid, ed.d
        |), c2d AS (
        |  SELECT c.cid, c.d, COALESCE(u2.v, c.v) AS v
        |  FROM c1d c LEFT JOIN u2 ON u2.cid = c.cid AND u2.d = c.d
        |), a3 AS (
        |  SELECT vec_id, cid, dist FROM (
        |    SELECT ed.vec_id, c.cid, SUM((ed.v - c.v) * (ed.v - c.v)) AS dist
        |    FROM ed JOIN c2d c ON ed.d = c.d GROUP BY ed.vec_id, c.cid)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |                             ORDER BY dist, cid) = 1
        |), cs AS (
        |  SELECT cid, CAST(SUM(v) AS BIGINT) AS centroid_sum
        |  FROM c2d GROUP BY cid
        |)
        |SELECT a3.cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(a3.dist) AS BIGINT) AS inertia, cs.centroid_sum
        |FROM a3 JOIN cs ON cs.cid = a3.cid
        |GROUP BY a3.cid, cs.centroid_sum
        |ORDER BY cluster_id""".stripMargin,
    "t11_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |    THEN list_transform(generate_series(1, len(toks)-7),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |    ELSE [] END)) AS gram
        |  FROM t
        |)
        |SELECT gram, COUNT(*) AS n_docs FROM s GROUP BY gram
        |HAVING COUNT(*) >= 3
        |ORDER BY n_docs DESC, gram""".stripMargin,
    "t21_boilerplate_strip" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), occ AS (
        |  SELECT doc_id, i AS start,
        |    concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                   toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS gram
        |  FROM t, unnest(CASE WHEN len(toks) >= 8
        |      THEN generate_series(1, len(toks)-7)
        |      ELSE [] END) AS u(i)
        |), lex AS (
        |  SELECT gram FROM (SELECT gram, doc_id FROM occ GROUP BY gram, doc_id)
        |  GROUP BY gram HAVING COUNT(*) >= 3
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT occ.doc_id,
        |           unnest(generate_series(occ.start, occ.start + 7)) AS pos
        |    FROM occ JOIN lex USING (gram)
        |  )
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |         unnest(generate_series(1, len(toks))) AS pos
        |  FROM t
        |), kept AS (
        |  SELECT tok.doc_id, tok.token, tok.pos FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM cov
        |                    WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
        |), reb AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(token, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id, len(t.toks) AS n_tokens,
        |       len(t.toks) - COALESCE(reb.n_kept, 0) AS n_removed,
        |       COALESCE(reb.clean_text, '') AS clean_text
        |FROM t LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t25_pii_scan" ->
      s"""WITH t AS (
        |  SELECT c_custkey, ${TextOps.piiTicketSql} AS ticket FROM customer
        |)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(0)._2}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(1)._2}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(2)._2}')) AS BIGINT) AS n_ipv4,
        |  greatest(len(regexp_extract_all(ticket, '${TextOps.piiPatterns(0)._2}')),
        |           len(regexp_extract_all(ticket, '${TextOps.piiPatterns(1)._2}')),
        |           len(regexp_extract_all(ticket, '${TextOps.piiPatterns(2)._2}'))) > 0
        |    AS has_pii
        |FROM t ORDER BY c_custkey""".stripMargin,
    "t25b_pii_scrub" ->
      s"""WITH t AS (
        |  SELECT c_custkey, ${TextOps.piiTicketSql} AS ticket FROM customer
        |), s AS (
        |  SELECT c_custkey,
        |    regexp_replace(regexp_replace(regexp_replace(ticket,
        |      '${TextOps.piiPatterns(0)._2}', '<EMAIL>', 'g'),
        |      '${TextOps.piiPatterns(1)._2}', '<PHONE>', 'g'),
        |      '${TextOps.piiPatterns(2)._2}', '<IP>', 'g') AS scrubbed
        |  FROM t
        |)
        |SELECT c_custkey, scrubbed,
        |  CAST(len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(0)._2}'))
        |     + len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(1)._2}'))
        |     + len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(2)._2}'))
        |    AS BIGINT) AS residual_pii
        |FROM s ORDER BY c_custkey""".stripMargin,
    "t24_repeated_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), occ AS (
        |  SELECT doc_id, i AS start,
        |    concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
        |                   toks[i+5], toks[i+6], toks[i+7], toks[i+8]) AS gram
        |  FROM t, unnest(CASE WHEN len(toks) >= 8
        |      THEN generate_series(0, len(toks)-8)
        |      ELSE [] END) AS u(i)
        |), lex AS (
        |  SELECT gram FROM (SELECT gram, doc_id FROM occ GROUP BY gram, doc_id)
        |  GROUP BY gram HAVING COUNT(*) >= 3
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT occ.doc_id,
        |           unnest(generate_series(occ.start, occ.start + 7)) AS pos
        |    FROM occ JOIN lex USING (gram)
        |  )
        |), isl AS (
        |  SELECT doc_id, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM cov
        |)
        |SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
        |       CAST(MAX(pos) + 1 AS INT) AS span_end,
        |       CAST(COUNT(*) AS BIGINT) AS span_tokens
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "t22_bm25" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(SUM(len(toks)) AS BIGINT) AS total_tokens FROM t
        |), post AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        |  FROM t
        |), tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM post
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id, dl, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |    10000 * (2 * s.n_docs - 2 * df.df + 1) * tf.tf * 22 * s.total_tokens
        |    // ((2 * df.df + 1)
        |        * (10 * tf.tf * s.total_tokens + 3 * s.total_tokens
        |           + 9 * tf.dl * s.n_docs)) AS term_score_e4
        |  FROM tf JOIN df USING (term), stats s
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(term_score_e4) AS BIGINT) AS score_e4,
        |         COUNT(*) AS n_terms_hit
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, doc_id, score_e4,
        |       n_terms_hit
        |FROM agg
        |WINDOW w AS (ORDER BY score_e4 DESC, doc_id)
        |QUALIFY ROW_NUMBER() OVER w <= 20
        |ORDER BY rank""".stripMargin,
    "t23_lm_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM documents
        |), model AS (
        |  SELECT term, COUNT(*) AS cnt FROM (
        |    SELECT unnest(toks) AS term FROM t WHERE nb < 12
        |  ) GROUP BY term
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS term FROM t
        |), scored AS (
        |  SELECT doc_id,
        |         CAST(length(bin(COALESCE(m.cnt, 0) + 1)) - 1 AS BIGINT) AS flog2
        |  FROM tok LEFT JOIN model m USING (term)
        |), agg AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |         CAST(SUM(flog2) AS BIGINT) AS lm_mass
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, lm_mass,
        |       10000 * lm_mass // n_tokens AS score_e4
        |FROM agg ORDER BY doc_id""".stripMargin,
    "t12_doc_keywords" ->
      """WITH tc AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tc GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         tf.tf * 1000000 // df.df AS score
        |  FROM tf JOIN df USING (term)
        |)
        |SELECT doc_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank, term,
        |       score, tf, df
        |FROM scored
        |WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, term)
        |QUALIFY ROW_NUMBER() OVER w <= 3
        |ORDER BY doc_id, rank""".stripMargin,
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
    "u4_union_missing" ->
      """SELECT * FROM (
        |  (SELECT o_orderkey, o_orderstatus FROM orders)
        |  UNION ALL BY NAME
        |  (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000)
        |)
        |ORDER BY o_orderkey, o_orderstatus NULLS FIRST""".stripMargin,
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
    "e8_erasure_audit" ->
      """WITH req AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE instr('0123456789abcdef',
        |              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 = 7
        |  UNION ALL SELECT CAST(1000001 AS BIGINT)
        |  UNION ALL SELECT CAST(1000002 AS BIGINT)
        |), hits AS (
        |  SELECT user_id, COUNT(*) AS n FROM events
        |  WHERE user_id IN (SELECT user_id FROM req)
        |  GROUP BY user_id
        |)
        |SELECT r.user_id,
        |       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_rows_removed,
        |       h.n IS NOT NULL AS found
        |FROM req r LEFT JOIN hits h USING (user_id)
        |ORDER BY r.user_id""".stripMargin,
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
    "t29_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT doc_id,
        |       CAST(LENGTH(text) AS BIGINT) AS n_chars_raw,
        |       CAST(LENGTH(norm) AS BIGINT) AS n_chars_norm,
        |       CAST(LEN(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm,
        |       SUBSTR(md5(norm), 1, 8) AS norm_key
        |FROM n ORDER BY doc_id""".stripMargin,
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
    "e16_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), l AS (
        |  SELECT event_type AS next_type, us,
        |         lag(event_type) OVER w AS prev_type,
        |         lag(us) OVER w AS prev_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), c AS (
        |  SELECT prev_type, next_type,
        |         CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |         CAST(SUM(us - prev_us) AS BIGINT) AS sum_gap_us
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT prev_type, next_type, n_transitions,
        |       CAST(n_transitions * 10000 //
        |            SUM(n_transitions) OVER (PARTITION BY prev_type)
        |         AS BIGINT) AS share_bp,
        |       CAST(sum_gap_us // n_transitions AS BIGINT) AS avg_gap_us
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
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
    "e7_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM orders
        |), o AS (
        |  SELECT o_orderkey, o_orderstatus AS old_o_orderstatus, cents AS old_cents
        |  FROM base WHERE nb <= 11
        |), n AS (
        |  SELECT o_orderkey, o_orderstatus AS new_o_orderstatus,
        |         CASE WHEN nb IN (4, 5) THEN cents + 100 ELSE cents END AS new_cents
        |  FROM base WHERE nb >= 2
        |), j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |         old_o_orderstatus, new_o_orderstatus, old_cents, new_cents,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
        |                   OR old_cents IS DISTINCT FROM new_cents THEN 'changed'
        |         END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |)
        |SELECT o_orderkey, change_type,
        |       old_o_orderstatus, new_o_orderstatus, old_cents, new_cents
        |FROM j WHERE change_type IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "d11_split_contract" ->
      """WITH tagged AS (
        |  SELECT doc_id,
        |    CASE WHEN instr('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 12
        |         THEN 'train'
        |         WHEN instr('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 14
        |         THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), per AS (
        |  SELECT s.split, COALESCE(n.n_docs, 0) AS n_docs
        |  FROM (VALUES ('train'), ('val'), ('test')) s(split)
        |  LEFT JOIN (
        |    SELECT split, COUNT(*) AS n_docs FROM tagged GROUP BY split
        |  ) n USING (split)
        |), tot AS (
        |  SELECT COUNT(DISTINCT doc_id) AS n_total FROM documents
        |), asg AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_assigned FROM per
        |)
        |SELECT split, n_docs, n_total,
        |       n_assigned = n_total AS covers_and_disjoint,
        |       n_docs > 0 AS nonempty
        |FROM per, tot, asg ORDER BY split""".stripMargin,
    "d18_jaccard_join" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
        |       CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS n_union
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        | AND len(a.sh) * 5 >= len(b.sh) * 4 AND len(b.sh) * 5 >= len(a.sh) * 4
        |WHERE len(list_intersect(a.sh, b.sh)) * 5
        |      >= len(list_distinct(list_concat(a.sh, b.sh))) * 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d19_containment" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
        |       CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
        |FROM s a JOIN s b ON a.doc_id <> b.doc_id
        | AND len(b.sh) * 5 >= len(a.sh) * 4
        |WHERE len(list_intersect(a.sh, b.sh)) * 5 >= len(a.sh) * 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "e25_max_drawdown" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), d AS (
        |  SELECT event_type, us,
        |         MAX(cents) OVER w - cents AS dd,
        |         MAX(cents) OVER w AS peak
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), a AS (
        |  SELECT event_type, CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents,
        |         CAST(MAX(peak) AS BIGINT) AS peak_cents,
        |         CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM d GROUP BY event_type
        |)
        |SELECT a.event_type, a.max_drawdown_cents, a.peak_cents, a.n_events,
        |       CAST(MIN(d.us) AS BIGINT) AS trough_us
        |FROM a JOIN d ON d.event_type = a.event_type
        |              AND d.dd = a.max_drawdown_cents
        |GROUP BY 1, 2, 3, 4 ORDER BY a.event_type""".stripMargin,
    "e27_engulfing" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), oc AS (
        |  SELECT DISTINCT bar_us, event_type,
        |    first_value(cents) OVER w AS open_cents,
        |    last_value(cents) OVER w AS close_cents
        |  FROM e
        |  WINDOW w AS (PARTITION BY bar_us, event_type ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), lagged AS (
        |  SELECT event_type, bar_us, open_cents, close_cents,
        |    lag(open_cents) OVER p AS prev_open,
        |    lag(close_cents) OVER p AS prev_close
        |  FROM oc
        |  WINDOW p AS (PARTITION BY event_type ORDER BY bar_us)
        |)
        |SELECT event_type, CAST(bar_us AS BIGINT) AS bar_us,
        |       CAST(prev_open AS BIGINT) AS prev_open,
        |       CAST(prev_close AS BIGINT) AS prev_close,
        |       CAST(open_cents AS BIGINT) AS open_cents,
        |       CAST(close_cents AS BIGINT) AS close_cents
        |FROM lagged
        |WHERE prev_close < prev_open AND close_cents > open_cents
        |  AND open_cents <= prev_close AND close_cents >= prev_open
        |ORDER BY event_type, bar_us""".stripMargin,
    "e26_rsi" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), cl AS (
        |  SELECT DISTINCT bar_us, event_type,
        |    last_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS close_cents
        |  FROM e
        |), w AS (
        |  SELECT event_type, bar_us, close_cents,
        |    close_cents - lag(close_cents) OVER
        |      (PARTITION BY event_type ORDER BY bar_us) AS delta
        |  FROM cl
        |), g AS (
        |  SELECT event_type, bar_us, close_cents,
        |    COUNT(delta) OVER f AS n_deltas,
        |    SUM(GREATEST(delta, 0)) OVER f AS gsum,
        |    SUM(GREATEST(-delta, 0)) OVER f AS lsum
        |  FROM w
        |  WINDOW f AS (PARTITION BY event_type ORDER BY bar_us
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, CAST(bar_us AS BIGINT) AS bar_us,
        |       CAST(close_cents AS BIGINT) AS close_cents,
        |       CASE WHEN n_deltas >= 14 AND gsum + lsum > 0
        |            THEN CAST(gsum * 1000 // (gsum + lsum) AS BIGINT)
        |       END AS rsi_permille
        |FROM g ORDER BY event_type, bar_us""".stripMargin,
    "e24_trend_slopes" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
        |), x AS (
        |  SELECT user_id, cents,
        |         (us - min(us) OVER (PARTITION BY user_id)) // 60000000 AS x
        |  FROM e
        |), s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(cents) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(x * cents) AS BIGINT) AS sxy
        |  FROM x GROUP BY user_id
        |)
        |SELECT user_id, n,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN n * sxy - sx * sy END AS slope_num,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN n * sxx - sx * sx END AS slope_den,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN sy * sxx - sx * sxy END AS intercept_num
        |FROM s ORDER BY user_id""".stripMargin,
    "d20_edit_distance" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 32) AS s
        |           FROM documents WHERE length(text) >= 32)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "e18_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), b AS (
        |  SELECT (us // 3600000000) * 3600000000 AS bar_us,
        |         event_type, cents, us, event_id
        |  FROM e
        |), w AS (
        |  SELECT bar_us, event_type, cents,
        |    first_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(cents) OVER (PARTITION BY bar_us, event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM b
        |)
        |SELECT bar_us, event_type,
        |       CAST(any_value(o) AS BIGINT) AS open_cents,
        |       CAST(MAX(cents) AS BIGINT) AS high_cents,
        |       CAST(MIN(cents) AS BIGINT) AS low_cents,
        |       CAST(any_value(c) AS BIGINT) AS close_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(cents) AS BIGINT) AS vol_cents
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e19_interval_coverage" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) + 1800000000 AS end_us
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |), m AS (
        |  SELECT user_id, us, end_us,
        |    max(end_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end,
        |    event_id
        |  FROM e
        |), g AS (
        |  SELECT user_id, us, end_us,
        |    SUM(CASE WHEN prev_end IS NULL OR us > prev_end THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m
        |), i AS (
        |  SELECT user_id, island, MIN(us) AS start_us, MAX(end_us) AS fin_us,
        |         COUNT(*) AS n
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |       CAST(SUM(fin_us - start_us) AS BIGINT) AS covered_us,
        |       CAST(MAX(fin_us - start_us) AS BIGINT) AS longest_us,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,
    "e20_trigram_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
        |), s AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e3
        |  FROM e
        |)
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n_paths DESC, e1, e2, e3""".stripMargin,
    "t30_weighted_sample" ->
      """WITH d AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w
        |  FROM documents WHERE n_chars > 0
        |), c AS (
        |  SELECT lang, doc_id, w,
        |    SUM(w) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY lang) AS tot
        |  FROM d
        |)
        |SELECT lang, doc_id, w,
        |       CAST((cw * 5) // tot - ((cw - w) * 5) // tot AS BIGINT) AS n_hits
        |FROM c
        |WHERE (cw * 5) // tot > ((cw - w) * 5) // tot
        |ORDER BY lang, doc_id""".stripMargin,
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
    "t31_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         array_to_string(toks[(i-1)*8+1 : (i-1)*8+8], ' ') AS seg
        |  FROM t, UNNEST(generate_series(1, ((len(toks) - 1) // 8) + 1)) AS u(i)
        |), k AS (
        |  SELECT doc_id, pos, seg,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM segs
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
        |                           ORDER BY pos), '') AS cleaned_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e23_session_incidents" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |), sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |         MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY 1, 2
        |), b AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us,
        |         COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2
        |), inc AS (
        |  SELECT event_type AS inc_type, bar_us FROM (
        |    SELECT *, SUM(n) OVER (PARTITION BY event_type) //
        |              COUNT(n) OVER (PARTITION BY event_type) AS target
        |    FROM b)
        |  WHERE n * 4 >= target * 5 + 4
        |)
        |SELECT sess.user_id, sess.session_id,
        |       CAST(sess.start_us AS BIGINT) AS start_us,
        |       CAST(sess.end_us AS BIGINT) AS end_us,
        |       CAST(COUNT(inc.bar_us) AS BIGINT) AS n_incident_hours,
        |       CAST(COUNT(DISTINCT inc.inc_type) AS BIGINT) AS n_incident_types
        |FROM sess LEFT JOIN inc
        |  ON sess.start_us < inc.bar_us + 3600000000
        | AND inc.bar_us <= sess.end_us
        |GROUP BY 1, 2, 3, 4
        |ORDER BY user_id, session_id""".stripMargin,
    "g4_bfs_hops" ->
      """WITH RECURSIVE
        |op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT a.p AS src, b.p AS dst FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |), e AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        |), walk(node, hops) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_brand = 'Brand#11'
        |  UNION ALL
        |  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON w.node = e.src
        |  WHERE w.hops < 3
        |)
        |SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "e21_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS key,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS base_cents
        |  FROM orders
        |  WHERE instr('0123456789abcdef',
        |              substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 < 12
        |), chg AS (
        |  SELECT l_orderkey AS key, l_linenumber AS seq,
        |         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), comp AS (
        |  SELECT key, op, cents AS chg_cents FROM (
        |    SELECT key, op, cents,
        |      row_number() OVER (PARTITION BY key
        |        ORDER BY seq DESC, op DESC, cents DESC) AS rn
        |    FROM chg) WHERE rn = 1
        |)
        |SELECT COALESCE(b.key, c.key) AS key,
        |       CAST(COALESCE(c.chg_cents, b.base_cents) AS BIGINT) AS cents,
        |       CASE WHEN c.key IS NULL THEN 'base'
        |            WHEN b.key IS NULL THEN 'insert'
        |            ELSE 'update' END AS src
        |FROM base b FULL OUTER JOIN comp c ON b.key = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY key""".stripMargin,
    "e22_join_maintenance" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM orders
        |), l AS (
        |  SELECT l_orderkey,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), j AS (
        |  SELECT o_orderstatus, cents,
        |         CASE WHEN l_orderkey % 7 = 0 THEN 1 ELSE 0 END AS is_dl,
        |         CASE WHEN nb >= 12 THEN 1 ELSE 0 END AS is_do
        |  FROM l JOIN o ON l_orderkey = o_orderkey
        |), terms AS (
        |  SELECT o_orderstatus, SUM(cents) AS c, COUNT(*) AS n
        |  FROM j WHERE is_dl = 0 AND is_do = 0 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 1 AND is_do = 0 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 0 AND is_do = 1 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, SUM(cents), COUNT(*)
        |  FROM j WHERE is_dl = 1 AND is_do = 1 GROUP BY 1
        |), m AS (
        |  SELECT o_orderstatus, CAST(SUM(c) AS BIGINT) AS maintained_cents,
        |         CAST(SUM(n) AS BIGINT) AS maintained_rows
        |  FROM terms GROUP BY 1
        |), f AS (
        |  SELECT o_orderstatus, CAST(SUM(cents) AS BIGINT) AS full_cents,
        |         CAST(COUNT(*) AS BIGINT) AS full_rows
        |  FROM j GROUP BY 1
        |)
        |SELECT f.o_orderstatus, full_cents, maintained_cents,
        |       full_rows, maintained_rows,
        |       full_cents IS NOT DISTINCT FROM maintained_cents AS cents_agree,
        |       full_rows IS NOT DISTINCT FROM maintained_rows AS rows_agree
        |FROM f FULL OUTER JOIN m USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
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
    "d17_group_split" ->
      """WITH tagged AS (
        |  SELECT source AS grp,
        |    CASE WHEN instr('0123456789abcdef',
        |                    substr(md5(CAST(source AS VARCHAR)), 1, 1)) - 1 < 12
        |         THEN 'train'
        |         WHEN instr('0123456789abcdef',
        |                    substr(md5(CAST(source AS VARCHAR)), 1, 1)) - 1 < 14
        |         THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), per AS (
        |  SELECT split, CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_sources,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM tagged GROUP BY split
        |), lk AS (
        |  SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0)
        |              AS BIGINT) AS n_leaking
        |  FROM (SELECT grp, COUNT(DISTINCT split) AS ns
        |        FROM tagged GROUP BY grp)
        |)
        |SELECT split, n_sources, n_docs, n_leaking = 0 AS leak_free
        |FROM per, lk ORDER BY split""".stripMargin,
    "d13_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens
        |FROM c WHERE cum <= 768 ORDER BY doc_id""".stripMargin,
    "t16_source_caps" ->
      """SELECT source, doc_id, lang, n_chars, rk FROM (
        |  SELECT source, doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 10 ORDER BY source, doc_id""".stripMargin,
    "t20_top_shingles" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                   toks[i+3], toks[i+4]))) AS gram
        |  FROM t WHERE len(toks) >= 5
        |)
        |SELECT gram, COUNT(*) AS n_occurrences
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram LIMIT 20""".stripMargin,
    "t18_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      CAST((greatest(len(toks) - 32, 0) + 23) // 24 AS BIGINT))) AS chunk_idx
        |  FROM t
        |)
        |SELECT doc_id, chunk_idx,
        |  len(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "t17_oov_rate" ->
      """WITH vocab AS (
        |  SELECT term FROM (
        |    SELECT unnest(list_distinct(string_split(text, ' '))) AS term
        |    FROM documents
        |  ) GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT 50
        |), va AS (
        |  SELECT list(term ORDER BY term) AS arr FROM vocab
        |)
        |SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text, ' '),
        |      t -> NOT list_contains(arr, t))) AS n_oov,
        |  CAST(len(list_filter(string_split(text, ' '),
        |       t -> NOT list_contains(arr, t))) * 1000
        |       // len(string_split(text, ' ')) AS BIGINT) AS oov_permille
        |FROM documents, va ORDER BY doc_id""".stripMargin,
    "s6_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000000) AS BIGINT)) AS xs
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), b AS (
        |  SELECT vec_id, xs, list_min(xs) AS qmin,
        |         list_max(xs) - list_min(xs) AS qrange
        |  FROM m
        |)
        |SELECT vec_id, qmin, qrange,
        |  CASE WHEN qrange = 0
        |       THEN array_to_string(list_transform(xs, x -> '0'), ',')
        |       ELSE array_to_string(list_transform(xs,
        |         x -> CAST(CAST(floor(CAST(x - qmin AS DOUBLE) * 255 / qrange)
        |                        AS BIGINT) AS VARCHAR)), ',')
        |  END AS codes_str,
        |  CASE WHEN qrange = 0 THEN CAST(0 AS BIGINT)
        |       ELSE list_max(list_transform(xs,
        |         x -> abs(x - (qmin + CAST(floor(
        |                CAST(floor(CAST(x - qmin AS DOUBLE) * 255 / qrange)
        |                     * qrange AS DOUBLE) / 255) AS BIGINT)))))
        |  END AS max_err
        |FROM b ORDER BY vec_id""".stripMargin,
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
    "e5_sql_front_door" ->
      """SELECT user_id,
        |       EXTRACT(year FROM CAST(ts AS DATE)) AS year,
        |       EXTRACT(month FROM CAST(ts AS DATE)) AS month,
        |       CAST(COUNT(*) AS BIGINT) AS total_registros,
        |       CAST(SUM(event_id) AS BIGINT) AS volume_total,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE value IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND event_id IS NOT NULL
        |GROUP BY user_id, EXTRACT(year FROM CAST(ts AS DATE)),
        |         EXTRACT(month FROM CAST(ts AS DATE))
        |ORDER BY user_id, year, month""".stripMargin,
    "t15_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
        |), c AS (
        |  SELECT lang, term, COUNT(*) AS cnt FROM tok GROUP BY lang, term
        |), r AS (
        |  SELECT lang, term, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY cnt DESC, term) AS rank
        |  FROM c
        |)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, term,
        |       CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "d9_decontaminate" -> d9OracleSql,
    "d14_fuzzy_decontam" ->
      """WITH d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, nb, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM d
        |), t AS (
        |  SELECT doc_id AS train_doc, len(sh) AS n_t, unnest(sh) AS gram
        |  FROM s WHERE nb < 15
        |), e AS (
        |  SELECT doc_id AS eval_doc, len(sh) AS n_e, unnest(sh) AS gram
        |  FROM s WHERE nb = 15
        |), p AS (
        |  SELECT train_doc, eval_doc, n_t, n_e, COUNT(*) AS i
        |  FROM t JOIN e USING (gram) GROUP BY 1, 2, 3, 4
        |)
        |SELECT train_doc, eval_doc,
        |       ROUND(i * 1.0 / (n_t + n_e - i), 4) AS jaccard
        |FROM p WHERE ROUND(i * 1.0 / (n_t + n_e - i), 4) >= 0.5
        |ORDER BY train_doc, eval_doc""".stripMargin,
    // d9b is CONTRACTUALLY the same oracle: the bloom prefilter may
    // only change where rows are dropped, never the result
    "d9b_decontaminate_bloom" -> d9OracleSql,
    "d15_semdedup" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xs,
        |         CAST(embedding AS DOUBLE[]) AS de
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), s AS (
        |  SELECT label, unnest(xs) AS v,
        |         unnest(generate_series(1, len(xs))) AS d
        |  FROM e WHERE label IS NOT NULL
        |), cdim AS (
        |  SELECT label AS c_label, d, CAST(SUM(v) // COUNT(*) AS BIGINT) AS cv
        |  FROM s GROUP BY label, d
        |), cent AS (
        |  SELECT c_label, list(cv ORDER BY d) AS c FROM cdim GROUP BY c_label
        |), dist AS (
        |  SELECT e.vec_id, cent.c_label,
        |    CAST(list_sum(list_transform(generate_series(1, len(e.xs)),
        |      i -> (e.xs[i] - cent.c[i]) * (e.xs[i] - cent.c[i]))) AS BIGINT) AS dist2
        |  FROM e, cent
        |), assign AS (
        |  SELECT vec_id, c_label AS cluster FROM dist
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |                             ORDER BY dist2, c_label) = 1
        |), pair AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v,
        |    ROUND(list_dot_product(eu.de, ev.de)
        |      / (sqrt(list_dot_product(eu.de, eu.de))
        |         * sqrt(list_dot_product(ev.de, ev.de))), 6) AS score
        |  FROM assign a JOIN assign b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  JOIN e eu ON eu.vec_id = a.vec_id
        |  JOIN e ev ON ev.vec_id = b.vec_id
        |), dropped AS (
        |  SELECT v AS vec_id, MIN(u) AS dropped_by
        |  FROM pair WHERE score >= 0.35 GROUP BY v
        |)
        |SELECT a.vec_id, a.cluster, d.dropped_by IS NULL AS kept, d.dropped_by
        |FROM assign a LEFT JOIN dropped d USING (vec_id)
        |ORDER BY a.vec_id""".stripMargin,
    "g2_triangles" ->
      """WITH op0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |             FROM lineitem WHERE l_partkey % 2 = 0),
        |op AS (SELECT o, p FROM (
        |         SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n FROM op0)
        |       WHERE n <= 8),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)
        |SELECT
        |  CAST((SELECT count(*) FROM (SELECT u AS x FROM e
        |                              UNION SELECT v FROM e)) AS BIGINT)
        |    AS n_vertices,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST((SELECT count(*) FROM e e1
        |        JOIN e e2 ON e1.v = e2.u
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
        |    AS n_triangles""".stripMargin,
    "g3_components" ->
      """WITH RECURSIVE op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e0 AS (
        |  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2
        |), eu AS (SELECT u, v FROM e0 WHERE c >= 2),
        |e AS (SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu),
        |cc AS (
        |  SELECT u AS node, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM cc JOIN e ON cc.node = e.u WHERE cc.lbl < e.v
        |)
        |SELECT node, MIN(lbl) AS component FROM cc GROUP BY node
        |ORDER BY node""".stripMargin,
    "g6_cheapest_path" -> {
      // 3 unrolled MATERIALIZED relaxation rounds — a min-table per
      // round (≤ |V| rows each), never a recursive walk enumeration
      val rounds = (1 to 3).map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT node, MIN(cost) AS cost FROM (
           |    SELECT node, cost FROM d${t - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, d.cost + e.w AS cost
           |    FROM d${t - 1} d JOIN e ON d.node = e.src
           |  ) GROUP BY node)""".stripMargin
      }.mkString(",\n", ",\n", "\n")
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT a.p AS src, b.p AS dst, 1000000 // COUNT(*) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT src, dst, w FROM e0
        |     UNION ALL SELECT dst, src, w FROM e0),
        |d0 AS MATERIALIZED (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS cost
        |     FROM part WHERE p_brand = 'Brand#11')""".stripMargin + rounds +
        "SELECT node, CAST(cost AS BIGINT) AS cost FROM d3 ORDER BY node"
    },
    "g5_kcore" -> {
      // peel rounds k1..k11 = maxRounds−1 (see GraphOps.kCore): whenever
      // the engine's convergence require passes, round 11 has provably
      // reached the same fixpoint (extra rounds are idempotent no-ops)
      // every k_t is referenced twice by k_{t+1}; without MATERIALIZED,
      // DuckDB inlines CTEs and the 11-round chain expands 2^11-fold
      val rounds = (1 to 11).map { t =>
        s"""k$t AS MATERIALIZED (SELECT u AS node, COUNT(*) AS c FROM e
           |  WHERE u IN (SELECT node FROM k${t - 1})
           |    AND v IN (SELECT node FROM k${t - 1})
           |  GROUP BY u HAVING COUNT(*) >= 2)""".stripMargin
      }.mkString(",\n", ",\n", "\n")
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |eu AS (SELECT u, v FROM e0 WHERE c >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu),
        |k0 AS MATERIALIZED (SELECT u AS node, COUNT(*) AS c FROM e
        |       GROUP BY u HAVING COUNT(*) >= 2)""".stripMargin + rounds +
        "SELECT node, CAST(c AS BIGINT) AS core_deg FROM k11 ORDER BY node"
    },
    "g1_pagerank" ->
      """WITH base AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), e AS (
        |  SELECT c_node AS src, s_node AS dst FROM base
        |  UNION ALL
        |  SELECT s_node AS src, c_node AS dst FROM base
        |), deg AS (
        |  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
        |), nodes AS (
        |  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
        |), s0 AS (
        |  SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
        |), c1 AS (
        |  SELECT e.dst AS node, CAST(SUM(s.score // d.outdeg) AS BIGINT) AS mass
        |  FROM e JOIN deg d USING (src) JOIN s0 s ON s.node = e.src
        |  GROUP BY e.dst
        |), s1 AS (
        |  SELECT n.node,
        |         CAST(150000 + 85 * COALESCE(c.mass, 0) // 100 AS BIGINT) AS score
        |  FROM nodes n LEFT JOIN c1 c USING (node)
        |), c2 AS (
        |  SELECT e.dst AS node, CAST(SUM(s.score // d.outdeg) AS BIGINT) AS mass
        |  FROM e JOIN deg d USING (src) JOIN s1 s ON s.node = e.src
        |  GROUP BY e.dst
        |), s2 AS (
        |  SELECT n.node,
        |         CAST(150000 + 85 * COALESCE(c.mass, 0) // 100 AS BIGINT) AS score
        |  FROM nodes n LEFT JOIN c2 c USING (node)
        |), c3 AS (
        |  SELECT e.dst AS node, CAST(SUM(s.score // d.outdeg) AS BIGINT) AS mass
        |  FROM e JOIN deg d USING (src) JOIN s2 s ON s.node = e.src
        |  GROUP BY e.dst
        |), s3 AS (
        |  SELECT n.node,
        |         CAST(150000 + 85 * COALESCE(c.mass, 0) // 100 AS BIGINT) AS score
        |  FROM nodes n LEFT JOIN c3 c USING (node)
        |)
        |SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |       CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
        |         AS node_type,
        |       node // 2 AS key, score AS score_micro
        |FROM s3
        |WINDOW w AS (ORDER BY score DESC, node)
        |QUALIFY ROW_NUMBER() OVER w <= 25
        |ORDER BY rank""".stripMargin,
    "t14_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
        |)
        |SELECT doc_id,
        |       CAST(SUM(c) AS BIGINT) AS n_grams,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
        |       CAST(MAX(c) AS BIGINT) AS top_gram_count,
        |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |         AS dup_gram_count
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e13_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |         (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS week
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), coh AS (
        |  SELECT user_id, week,
        |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM act
        |), cell AS (
        |  SELECT cohort_week, week - cohort_week AS week_offset,
        |         CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM coh GROUP BY 1, 2
        |), sized AS (
        |  SELECT *, MAX(CASE WHEN week_offset = 0 THEN n_active END)
        |              OVER (PARTITION BY cohort_week) AS cohort_size
        |  FROM cell
        |)
        |SELECT cohort_week, week_offset, n_active,
        |       CAST(cohort_size AS BIGINT) AS cohort_size,
        |       CAST(n_active * 1000 // cohort_size AS BIGINT)
        |         AS retention_permille
        |FROM sized ORDER BY cohort_week, week_offset""".stripMargin,
    "a14_unpivot" ->
      """SELECT o_orderpriority, l_returnflag,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a12_hll_contract" ->
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS within_5pct, TRUE AS merge_within_5pct
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a18_sliding_hll" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT DISTINCT day AS g_day FROM d)
        |SELECT g.g_day AS day,
        |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_exact_7d,
        |       TRUE AS within_5pct
        |FROM g JOIN d ON d.day BETWEEN g.g_day - 6 AND g.g_day
        |GROUP BY g.g_day ORDER BY day""".stripMargin,
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
    "e15_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 3600000000 THEN 1
        |            ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY us
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f
        |)
        |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) + 3600000000 AS BIGINT) AS end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "e14_sliding_window" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, user_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL
        |), w AS (
        |  SELECT (us // 600000000) * 600000000 - i * 600000000
        |           AS window_start_us,
        |         user_id, event_type, cents
        |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) sl
        |)
        |SELECT window_start_us, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e17_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS k
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *,
        |    last_value(CASE WHEN k = 0 THEN event_id END IGNORE NULLS) OVER w
        |      AS last_click_id,
        |    last_value(CASE WHEN k = 0 THEN us END IGNORE NULLS) OVER w
        |      AS last_click_us
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, k, event_id
        |               ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT event_id, user_id, CAST(us AS BIGINT) AS purchase_us,
        |  CASE WHEN last_click_us IS NOT NULL
        |         AND us - last_click_us <= 3600000000
        |       THEN last_click_id END AS click_id,
        |  CASE WHEN last_click_us IS NOT NULL
        |         AND us - last_click_us <= 3600000000
        |       THEN CAST(us - last_click_us AS BIGINT) END AS gap_us
        |FROM m WHERE k = 1 ORDER BY event_id""".stripMargin,
    "e12_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), s0 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
        |              OVER (PARTITION BY user_id) AS t0
        |  FROM e
        |), s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us >= t0
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS t1
        |  FROM s0
        |), s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us >= t1
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS t2
        |  FROM s1
        |), u AS (
        |  SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
        |  FROM s2 GROUP BY user_id
        |), c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM u
        |)
        |SELECT step, step_name, n_users, conv_permille FROM (
        |  SELECT 1 AS step, 'view' AS step_name, n0 AS n_users,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n0 * 1000 // n0 END AS conv_permille
        |  FROM c
        |  UNION ALL
        |  SELECT 2, 'click', n1,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n1 * 1000 // n0 END FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', n2,
        |         CASE WHEN n0 = 0 THEN 0 ELSE n2 * 1000 // n0 END FROM c
        |) ORDER BY step""".stripMargin,
    "e6_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) AS BIGINT) AS end_us,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "e4_incremental_agg" ->
      """SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |       TRUE AS incremental_matches
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "t13_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), o AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(generate_series(1, len(toks) - 1),
        |      i -> toks[i] = 'order' AND toks[i+1] = 'fast')) AS BIGINT) AS n_occurrences
        |  FROM t
        |)
        |SELECT doc_id, n_occurrences FROM o
        |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin,
    "e3_latest_per_key" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "a8b_approx_percentile" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
        |       TRUE AS median_within_rank_error
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "e2_scd2_merge" ->
      (scd2MergedCte +
        "\nSELECT * FROM merged ORDER BY c_custkey, valid_from"),
    "e11_pit_lookup" ->
      (scd2MergedCte + """
        |, t0 AS (
        |  SELECT c_custkey, c_mktsegment FROM merged
        |  WHERE valid_from <= 0 AND (valid_to IS NULL OR valid_to > 0)
        |), t1 AS (
        |  SELECT c_custkey, c_mktsegment FROM merged
        |  WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)
        |)
        |SELECT o.o_orderkey, o.o_custkey,
        |       t0.c_mktsegment AS seg_t0, t1.c_mktsegment AS seg_t1,
        |       t0.c_mktsegment IS DISTINCT FROM t1.c_mktsegment AS segment_changed
        |FROM orders o
        |LEFT JOIN t0 ON o.o_custkey = t0.c_custkey
        |LEFT JOIN t1 ON o.o_custkey = t1.c_custkey
        |ORDER BY o_orderkey""".stripMargin),
    "t9_vocab_topk" ->
      """WITH dt AS (
        |  SELECT lang, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents
        |), df AS (
        |  SELECT lang, term, COUNT(*) AS doc_freq FROM dt GROUP BY lang, term
        |)
        |SELECT lang, CAST(ROW_NUMBER() OVER w AS INT) AS rank, term, doc_freq
        |FROM df
        |WINDOW w AS (PARTITION BY lang ORDER BY doc_freq DESC, term)
        |QUALIFY ROW_NUMBER() OVER w <= 10
        |ORDER BY lang, rank""".stripMargin,
    "t10_pack_chunks" ->
      """SELECT doc_id, lang,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | CAST(floor((SUM(len(string_split(text, ' ')))
        |        OVER (PARTITION BY lang ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - len(string_split(text, ' '))) / 512) AS INT) AS chunk_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t7_hash_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 6
        |ORDER BY doc_id""".stripMargin,
    "t8_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        |      < CASE WHEN lang = 'en' THEN 6 ELSE 12 END
        |ORDER BY doc_id""".stripMargin,
    "d1_exact_dedup" ->
      "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id",
    "d2_dup_stats" ->
      "SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique FROM documents GROUP BY lang ORDER BY lang",
    "d5b_signature_contract" ->
      "SELECT lang, TRUE AS partition_invariant FROM documents GROUP BY lang ORDER BY lang",
    "d4c_simhash_contract" ->
      "SELECT TRUE AS nonempty, TRUE AS complete, TRUE AS sound",
    "e8b_erasure_propagation" ->
      """SELECT TRUE AS erasure_nonempty, TRUE AS bands_nonempty,
        |       TRUE AS bands_equal, TRUE AS bands_clean,
        |       TRUE AS sigs_equal, TRUE AS ivf_nonempty,
        |       TRUE AS ivf_equal, TRUE AS ivf_clean""".stripMargin,
    "s8_ann_contract" ->
      "SELECT TRUE AS nonempty, TRUE AS recall_ok",
    "s9_append_contract" ->
      "SELECT TRUE AS split_nonempty, TRUE AS append_equal",
    "s12_pq_contract" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, TRUE AS err_monotone,
        |       TRUE AS nonempty, TRUE AS recall_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "s13_truncated_scan" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |       TRUE AS nonempty, TRUE AS recall_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "d12_signature_merge" ->
      "SELECT TRUE AS split_nonempty, TRUE AS merge_equal",
    "d6_curated" -> CuratedSql,
    // typed path, same referee:
    "d6b_curated_typed" -> CuratedSql,
    "d8_training_prep" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text, lang, string_split(text, ' ') AS toks,
        |         length(text) AS nc
        |  FROM documents
        |  WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 12
        |), c AS (
        |  SELECT doc_id, text, lang, nc, CAST(len(toks) AS INT) AS nt,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
        |   CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
        |  FROM base
        |), q AS (
        |  SELECT doc_id, text, lang, nt,
        |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
        |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS score,
        |    CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS plang
        |  FROM c
        |), d AS (
        |  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
        |         text, min(nt) AS nt
        |  FROM q WHERE score >= 3 AND plang = 'en'
        |  GROUP BY text
        |), s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
        |    THEN list_transform(generate_series(1, len(string_split(text, ' '))-2),
        |         i -> concat_ws(' ', string_split(text, ' ')[i],
        |              string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM d
        |), p AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |   AND len(a.sh) * 10000 >= len(b.sh) * 8999 AND len(b.sh) * 10000 >= len(a.sh) * 8999
        |  WHERE ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.9
        |), e AS (
        |  SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p
        |), cc AS (
        |  SELECT doc_id AS node, doc_id AS label FROM d
        |  UNION
        |  SELECT e.b AS node, cc.label FROM cc JOIN e ON cc.node = e.a
        |), lab AS (
        |  SELECT node, min(label) AS lbl FROM cc GROUP BY node
        |), reps AS (
        |  SELECT d.doc_id, d.lang, CAST(d.nt AS INT) AS n_tokens
        |  FROM d JOIN lab ON d.doc_id = lab.node
        |  WHERE lab.lbl = d.doc_id
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       - n_tokens) / 512) AS INT) AS chunk_id
        |FROM reps ORDER BY doc_id""".stripMargin,
    "t1_token_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         length(text) AS nc
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, nc, CAST(len(toks) AS INT) AS nt,
        |   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS nb,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
        |   CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
        |  FROM t
        |)
        |SELECT doc_id, nt AS n_tokens, nb AS n_bpeish, nc AS n_chars_calc,
        |  nsw AS n_stopwords,
        |  (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |   + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
        |   + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |   + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS quality_score
        |FROM c ORDER BY doc_id""".stripMargin,
    "t2_lang_id" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nsw,
        |   len(string_split(text, ' ')) AS nt
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS predicted_lang
        |FROM c ORDER BY doc_id""".stripMargin,
    "t19_lang_confusion" ->
      """WITH c AS (
        |  SELECT lang,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nsw,
        |   len(string_split(text, ' ')) AS nt
        |  FROM documents
        |), p AS (
        |  SELECT lang,
        |    CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS predicted_lang
        |  FROM c
        |)
        |SELECT lang, predicted_lang, COUNT(*) AS n_docs
        |FROM p GROUP BY lang, predicted_lang
        |ORDER BY lang, predicted_lang""".stripMargin,
    "t3_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, md5(text) AS fp_md5,
        |   CASE WHEN len(toks) >= 3
        |        THEN list_transform(generate_series(1, len(toks) - 2),
        |             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |        ELSE [text] END AS shingles
        |  FROM t
        |)
        |SELECT doc_id, fp_md5,
        |  list_aggregate(list_transform(shingles, x -> md5(x)), 'min') AS fp_min_shingle
        |FROM s ORDER BY doc_id""".stripMargin,
    "t4_lang_stats" ->
      "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(DISTINCT source) AS n_sources FROM documents GROUP BY lang ORDER BY lang",
    "e1_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k,
        | CAST(props->>'$.k' AS INT) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,
    "s1_cosine_topk" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
        |)
        |SELECT e.vec_id,
        |  ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
        |        / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |           * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
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
    "t32_chi2_tokens" ->
      """WITH tot AS (
        |  SELECT COUNT(*) AS nd,
        |         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
        |  FROM documents
        |), d AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
        |         unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents
        |), g AS (
        |  SELECT tok, COUNT(*) AS df, SUM(is_en) AS a
        |  FROM d GROUP BY 1
        |  HAVING COUNT(*) >= 50 AND COUNT(*) < (SELECT nd FROM tot)
        |), t AS (
        |  SELECT tok, a, df - a AS b, tot.np - a AS c,
        |         tot.nd - tot.np - (df - a) AS d, tot.nd AS nd,
        |         a * (tot.nd - tot.np - (df - a)) - (df - a) * (tot.np - a) AS det
        |  FROM g CROSS JOIN tot
        |)
        |SELECT tok, CAST(a AS BIGINT) AS n_en_with,
        |       CAST(b AS BIGINT) AS n_other_with,
        |       CAST(CAST(1000000 AS HUGEINT) * nd * det * det
        |            // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
        |            AS BIGINT) AS chi2_micro,
        |       CAST(CASE WHEN det > 0 THEN 1 WHEN det < 0 THEN -1 ELSE 0 END
        |            AS BIGINT) AS direction
        |FROM t ORDER BY chi2_micro DESC, tok LIMIT 25""".stripMargin,
    "e28_golden_record" ->
      """WITH b AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |         CASE WHEN event_type = 'purchase'
        |              THEN CAST(round(value * 100) AS BIGINT) END AS value_cents,
        |         CASE WHEN event_type = 'click'
        |              THEN CAST(props->>'$.k' AS BIGINT) END AS k
        |  FROM events WHERE user_id IS NOT NULL
        |), w AS (
        |  SELECT user_id,
        |    last_value(event_type IGNORE NULLS) OVER wu AS last_event_type,
        |    last_value(CASE WHEN event_type IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_event_type_us,
        |    last_value(value_cents IGNORE NULLS) OVER wu AS last_purchase_cents,
        |    last_value(CASE WHEN value_cents IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_purchase_us,
        |    last_value(k IGNORE NULLS) OVER wu AS last_click_k,
        |    last_value(CASE WHEN k IS NOT NULL THEN us END
        |               IGNORE NULLS) OVER wu AS last_click_us
        |  FROM b
        |  WINDOW wu AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MAX(last_event_type) AS last_event_type,
        |       CAST(MAX(last_event_type_us) AS BIGINT) AS last_event_type_us,
        |       CAST(MAX(last_purchase_cents) AS BIGINT) AS last_purchase_cents,
        |       CAST(MAX(last_purchase_us) AS BIGINT) AS last_purchase_us,
        |       CAST(MAX(last_click_k) AS BIGINT) AS last_click_k,
        |       CAST(MAX(last_click_us) AS BIGINT) AS last_click_us
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "t33_inverted_index" ->
      """WITH tf AS (
        |  SELECT tok, doc_id, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT tok, doc_id, tf,
        |         row_number() OVER (PARTITION BY tok
        |           ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf
        |)
        |SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
        |       CAST(SUM(tf) AS BIGINT) AS cf,
        |       string_agg(CASE WHEN rn <= 3
        |                       THEN doc_id || ':' || tf END, ',' ORDER BY rn)
        |         AS top_postings
        |FROM r GROUP BY tok HAVING COUNT(*) >= 20 ORDER BY tok""".stripMargin,
    "s14_rrf_fusion" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
        |), dtop AS (
        |  SELECT e.vec_id,
        |    ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
        |          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                   CAST(e.embedding AS DOUBLE[])))
        |             * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> 0
        |  ORDER BY score DESC, vec_id LIMIT 50
        |), dense AS (
        |  SELECT vec_id AS id,
        |         ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rank_dense
        |  FROM dtop
        |), t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(SUM(len(toks)) AS BIGINT) AS total_tokens FROM t
        |), post AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        |  FROM t
        |), tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM post
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id, dl, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |    10000 * (2 * s.n_docs - 2 * df.df + 1) * tf.tf * 22 * s.total_tokens
        |    // ((2 * df.df + 1)
        |        * (10 * tf.tf * s.total_tokens + 3 * s.total_tokens
        |           + 9 * tf.dl * s.n_docs)) AS term_score_e4
        |  FROM tf JOIN df USING (term), stats s
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(term_score_e4) AS BIGINT) AS score_e4
        |  FROM scored GROUP BY doc_id
        |), sparse AS (
        |  SELECT doc_id AS id,
        |         ROW_NUMBER() OVER (ORDER BY score_e4 DESC, doc_id) AS rank_sparse
        |  FROM agg
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY score_e4 DESC, doc_id) <= 50
        |)
        |SELECT COALESCE(dense.id, sparse.id) AS id,
        |       CAST(rank_dense AS BIGINT) AS rank_dense,
        |       CAST(rank_sparse AS BIGINT) AS rank_sparse,
        |       CAST(COALESCE(1000000 // (60 + rank_dense), 0)
        |            + COALESCE(1000000 // (60 + rank_sparse), 0) AS BIGINT)
        |         AS rrf_e6
        |FROM dense FULL JOIN sparse ON dense.id = sparse.id
        |ORDER BY rrf_e6 DESC, id LIMIT 20""".stripMargin,
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
    "e29_seasonal_backtest" ->
      """WITH grid AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bar_us,
        |         COUNT(*) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), j AS (
        |  SELECT g.event_type, g.bar_us, g.cnt, b.cnt AS base_cnt
        |  FROM grid g LEFT JOIN grid b
        |    ON b.event_type = g.event_type
        |   AND b.bar_us = g.bar_us - 86400000000
        |  WHERE g.bar_us >= (SELECT MIN(bar_us) FROM grid) + 86400000000
        |)
        |SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       CAST(SUM(CASE WHEN base_cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_missing_base,
        |       CAST(SUM(CASE WHEN base_cnt IS NOT NULL
        |                     THEN abs(cnt - base_cnt) END) AS BIGINT)
        |         AS abs_err_sum,
        |       CAST(SUM(CASE WHEN base_cnt IS NOT NULL
        |                     THEN cnt - base_cnt END) AS BIGINT) AS bias_sum,
        |       CAST(MAX(CASE WHEN base_cnt IS NOT NULL
        |                     THEN abs(cnt - base_cnt) END) AS BIGINT)
        |         AS worst_abs_err
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "t34_lexical_diversity" ->
      """WITH tc AS (
        |  SELECT source, tok, COUNT(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT source,
        |       CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       CAST(COUNT(*) * 1000 // SUM(c) AS BIGINT) AS ttr_permille,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
        |            AS BIGINT) AS hapax_permille
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // e30's oracle is the ONE-SHOT sessionization (same SQL as e6): the
    // incremental path must reproduce it bit for bit.
    "e30_incremental_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) AS BIGINT) AS end_us,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "d21_cross_source_dups" ->
      """WITH counts AS (
        |  SELECT md5(text) AS h, source, COUNT(*) AS c
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |       CAST(SUM(CASE WHEN a.source = b.source
        |                     THEN a.c * (a.c - 1) // 2
        |                     ELSE a.c * b.c END) AS BIGINT) AS n_dup_pairs
        |FROM counts a JOIN counts b
        |  ON a.h = b.h AND a.source <= b.source
        |GROUP BY 1, 2
        |HAVING SUM(CASE WHEN a.source = b.source
        |                THEN a.c * (a.c - 1) // 2
        |                ELSE a.c * b.c END) > 0
        |ORDER BY 1, 2""".stripMargin,
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
    "s15_retrieval_eval" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
        |         label AS q_label
        |  FROM embeddings WHERE vec_id BETWEEN 0 AND 19
        |), scored AS (
        |  SELECT q.query_id, q.q_label, e.vec_id, e.label AS n_label_val,
        |    ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
        |          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                   CAST(e.embedding AS DOUBLE[])))
        |             * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, q_label, n_label_val,
        |         CAST(ROW_NUMBER() OVER w AS INT) AS rank
        |  FROM scored
        |  WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, vec_id)
        |  QUALIFY ROW_NUMBER() OVER w <= 20
        |), agg AS (
        |  SELECT query_id, q_label,
        |    CAST(SUM(CASE WHEN n_label_val = q_label THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_rel_at_k,
        |    MIN(CASE WHEN n_label_val = q_label THEN rank END)
        |      AS first_rel_rank,
        |    MAX(n_label_val = q_label) AS hit_at_k
        |  FROM ranked GROUP BY 1, 2
        |), totals AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
        |  FROM embeddings GROUP BY 1
        |)
        |SELECT a.query_id, a.q_label, a.n_rel_at_k, a.first_rel_rank,
        |  a.hit_at_k,
        |  CAST(COALESCE(1000 // a.first_rel_rank, 0) AS BIGINT)
        |    AS mrr_permille,
        |  CAST(a.n_rel_at_k * 1000 // nullif(t.n_label - 1, 0) AS BIGINT)
        |    AS recall_permille
        |FROM agg a JOIN totals t ON t.label = a.q_label
        |ORDER BY a.query_id""".stripMargin,
    "e31_cusum_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS hour_cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT event_type, bar,
        |    CAST(SUM(hour_cents) OVER
        |      (PARTITION BY event_type ORDER BY bar) AS BIGINT) AS s_i,
        |    CAST(ROW_NUMBER() OVER
        |      (PARTITION BY event_type ORDER BY bar) AS BIGINT) AS i,
        |    CAST(SUM(hour_cents) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS s_n,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hourly
        |), d AS (
        |  SELECT *, n * s_i - i * s_n AS d FROM scored WHERE i < n
        |)
        |SELECT event_type, n AS n_hours,
        |       bar * 3600000000 AS changepoint_us,
        |       abs(d) AS max_abs_d, s_i AS sum_before, i AS n_before,
        |       s_n - s_i AS sum_after, n - i AS n_after
        |FROM d
        |QUALIFY ROW_NUMBER() OVER
        |  (PARTITION BY event_type ORDER BY abs(d) DESC, bar) = 1
        |ORDER BY event_type""".stripMargin,
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
    "a19_q6_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE EXTRACT(year FROM l_shipdate) = 1997
        |  AND CAST(round(l_discount * 1000) AS BIGINT) BETWEEN 50 AND 70
        |  AND CAST(round(l_quantity) AS BIGINT) < 24""".stripMargin,
    "t35_quality_cut" ->
      """WITH c AS (
        |  SELECT doc_id, lang, length(text) AS nc,
        |    CAST(len(string_split(text, ' ')) AS INT) AS nt,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','an','and','of','to','in','is','it','that')))
        |      AS INT) AS nsw,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> length(x) > 25)) AS INT) AS nlong
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10
        |       THEN 1 ELSE 0 END
        |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS score
        |  FROM c
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
        |h AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt FROM s
        |      GROUP BY score),
        |cum AS (SELECT score, SUM(cnt) OVER (ORDER BY score) AS cum FROM h),
        |thr AS (SELECT CAST(MIN(score) AS INT) AS threshold FROM cum, n
        |        WHERE cum * 10 >= n * 7)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(MAX(threshold) AS INT) AS threshold
        |FROM s, thr GROUP BY lang ORDER BY lang""".stripMargin,
    "t36_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
        |    (ROW_NUMBER() OVER (PARTITION BY n_tokens // 64
        |       ORDER BY doc_id) - 1) // 32 AS batch_id
        |  FROM t
        |)
        |SELECT bucket, batch_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
        |    AS padding_waste
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s16_dim_stats" ->
      """WITH e AS (
        |  SELECT CAST(unnest(generate_series(1, len(embedding))) AS INT) - 1
        |           AS dim,
        |         unnest(list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
        |           AS m
        |  FROM embeddings
        |), a AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(m) AS BIGINT) AS s, CAST(SUM(m * m) AS BIGINT) AS q
        |  FROM e GROUP BY dim
        |)
        |SELECT dim, n, s // n AS mean_micro,
        |       q // n - (s // n) * (s // n) AS var_micro2
        |FROM a ORDER BY dim""".stripMargin,
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
    "g7_degree_hist" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e0 AS (
        |  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2
        |), eu AS (SELECT u, v FROM e0 WHERE c >= 2),
        |d AS (
        |  SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS degree
        |  FROM (SELECT u AS x FROM eu UNION ALL SELECT v AS x FROM eu)
        |  GROUP BY x
        |)
        |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY degree ORDER BY degree""".stripMargin,
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
    "d22_minhash_oracle" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), tok AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
        |m AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647
        |      AS m
        |  FROM tok
        |), sig AS (
        |  SELECT doc_id,
        |    MIN((919393 * m + 12289) % 2147483647) AS h0,
        |    MIN((273647 * m + 514229) % 2147483647) AS h1,
        |    MIN((877571 * m + 39916801) % 2147483647) AS h2,
        |    MIN((499979 * m + 6700417) % 2147483647) AS h3,
        |    MIN((331777 * m + 1299709) % 2147483647) AS h4,
        |    MIN((764321 * m + 15485863) % 2147483647) AS h5,
        |    MIN((104729 * m + 32452843) % 2147483647) AS h6,
        |    MIN((611953 * m + 49979687) % 2147483647) AS h7
        |  FROM m GROUP BY doc_id
        |), bk AS (
        |  SELECT doc_id, concat_ws(':', 0, h0, h1) AS band_key FROM sig
        |  UNION ALL SELECT doc_id, concat_ws(':', 1, h2, h3) FROM sig
        |  UNION ALL SELECT doc_id, concat_ws(':', 2, h4, h5) FROM sig
        |  UNION ALL SELECT doc_id, concat_ws(':', 3, h6, h7) FROM sig
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b
        |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter,
        |  CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
        |    AS BIGINT) AS n_union
        |FROM cand JOIN s sa ON sa.doc_id = doc_a
        |          JOIN s sb ON sb.doc_id = doc_b
        |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 5
        |      >= CAST(len(sa.sh) + len(sb.sh)
        |              - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    // the 60 per-bit sums / signature recombination / band extraction are
    // generated, not hand-written — same structure as the Scala side
    "d23_simhash_oracle" -> {
      val sums = (0 until 60).map(b =>
        s"SUM(CASE WHEN (m // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
        .mkString(",\n    ")
      val sigExpr = (0 until 60).map(b =>
        s"CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      val bands = (0 until 4).map(i =>
        s"SELECT doc_id, sig, concat_ws(':', $i, " +
          s"(sig // ${1L << (15 * i)}) % ${1L << 15}) AS band_key FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
         |    AS tok
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS m
         |  FROM tok
         |), sums AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM m GROUP BY doc_id
         |), sig AS (SELECT doc_id, $sigExpr AS sig FROM sums),
         |bk AS (
         |  $bands
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hd
         |FROM bk a JOIN bk b
         |  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // the 30 plane-dot columns and band keys are generated from the SAME
    // LCG weight formula the Spark operator embeds (single source of truth)
    "s17_ann_oracle" -> {
      val dims = 64
      val dotCols = (0 until 30).map { i =>
        val w = (0 until dims)
          .map(j => operators.Similarity.annPlaneWeight(i, j, dims))
          .mkString("[", ", ", "]")
        s"list_sum(list_transform(generate_series(1, $dims), j -> ($w)[j] * m[j])) AS d$i"
      }.mkString(",\n    ")
      val bandSelects = (0 until 6).map { b =>
        val bits = (0 until 5).map { r =>
          s"CASE WHEN d${b * 5 + r} >= 0 THEN 1 ELSE 0 END"
        }.mkString(", ")
        s"SELECT vec_id, concat_ws(':', $b, $bits) AS band_key FROM dots"
      }.mkString("\n  UNION ALL ")
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m
         |  FROM embeddings WHERE len(embedding) = $dims
         |), dots AS (
         |  SELECT vec_id,
         |    $dotCols
         |  FROM base
         |), bk AS (
         |  $bandSelects
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bk a JOIN bk b
         |    ON a.band_key = b.band_key AND a.vec_id < b.vec_id
         |), n AS (
         |  SELECT vec_id, m,
         |    list_sum(list_transform(generate_series(1, $dims),
         |      j -> m[j] * m[j])) AS n2
         |  FROM base
         |), v AS (
         |  SELECT vec_a, vec_b,
         |    list_sum(list_transform(generate_series(1, $dims),
         |      j -> na.m[j] * nb.m[j])) AS dot,
         |    na.n2 AS na2, nb.n2 AS nb2
         |  FROM cand JOIN n na ON na.vec_id = vec_a
         |            JOIN n nb ON nb.vec_id = vec_b
         |)
         |SELECT vec_a, vec_b, CAST(dot AS BIGINT) AS dot_micro2,
         |  CAST(na2 AS BIGINT) AS norm2_a, CAST(nb2 AS BIGINT) AS norm2_b
         |FROM v
         |WHERE dot >= 0
         |  AND CAST(25 AS HUGEINT) * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
         |      >= CAST(4 AS HUGEINT) * CAST(na2 AS HUGEINT) * CAST(nb2 AS HUGEINT)
         |ORDER BY vec_a, vec_b""".stripMargin
    },
    "d24_signatures_oracle" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [text] END) AS sh
        |  FROM t
        |), tok AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
        |m AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647
        |      AS m
        |  FROM tok
        |)
        |SELECT doc_id,
        |  MIN((919393 * m + 12289) % 2147483647) AS h0,
        |  MIN((273647 * m + 514229) % 2147483647) AS h1,
        |  MIN((877571 * m + 39916801) % 2147483647) AS h2,
        |  MIN((499979 * m + 6700417) % 2147483647) AS h3,
        |  MIN((331777 * m + 1299709) % 2147483647) AS h4,
        |  MIN((764321 * m + 15485863) % 2147483647) AS h5,
        |  MIN((104729 * m + 32452843) % 2147483647) AS h6,
        |  MIN((611953 * m + 49979687) % 2147483647) AS h7
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "g8_link_prediction" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT a.p AS src, b.p AS dst
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |), sym AS (
        |  SELECT src AS x, dst AS y FROM e
        |  UNION ALL SELECT dst AS x, src AS y FROM e
        |), deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
        |cn AS (
        |  SELECT l.x AS a, r.x AS b, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM sym l JOIN sym r ON l.y = r.y AND l.x < r.x
        |  GROUP BY 1, 2
        |), nonadj AS (
        |  SELECT cn.a, cn.b, cn.common FROM cn
        |  ANTI JOIN e ON cn.a = e.src AND cn.b = e.dst
        |)
        |SELECT n.a, n.b, n.common, da.d AS deg_a, db.d AS deg_b,
        |       CAST(n.common * 1000 // (da.d + db.d - n.common) AS BIGINT)
        |         AS jaccard_permille
        |FROM nonadj n JOIN deg da ON n.a = da.x JOIN deg db ON n.b = db.x
        |ORDER BY n.common DESC, n.a, n.b LIMIT 25""".stripMargin,
    "g9_frequent_triples" ->
      """WITH op0 AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), op AS (
        |  SELECT o, p FROM (
        |    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n FROM op0
        |  ) WHERE n <= 8
        |)
        |SELECT a.p AS p1, b.p AS p2, c.p AS p3,
        |       CAST(COUNT(*) AS BIGINT) AS support
        |FROM op a
        |JOIN op b ON a.o = b.o AND a.p < b.p
        |JOIN op c ON b.o = c.o AND b.p < c.p
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        |ORDER BY support DESC, p1, p2, p3 LIMIT 50""".stripMargin,
    "e32_bollinger" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) // 3600000000 AS bar,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, bar,
        |         arg_max(cents, CAST(us AS HUGEINT) * 1000000 + event_id)
        |           AS close
        |  FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, close,
        |         COUNT(*) OVER w AS n, SUM(close) OVER w AS s,
        |         SUM(close * close) OVER w AS q
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bar
        |                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  CAST(SUM(CASE WHEN (n*close - s) > 0
        |        AND (n*close - s) * (n*close - s) > 4 * (n*q - s*s)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(SUM(CASE WHEN (n*close - s) < 0
        |        AND (n*close - s) * (n*close - s) > 4 * (n*q - s*s)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM s WHERE n = 20 GROUP BY 1 ORDER BY 1""".stripMargin,
    "e33_vwap" ->
      """WITH e AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 3600000000 * 3600000000 AS bar_us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         CAST(json_extract_string(props, 'k') AS BIGINT) AS vol
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT bar_us, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(vol) AS BIGINT) AS volume,
        |       CAST(SUM(cents * vol) AS BIGINT) AS notional_cents,
        |       CASE WHEN SUM(vol) > 0
        |            THEN CAST(SUM(cents * vol) // SUM(vol) AS BIGINT) END
        |         AS vwap_cents
        |FROM e WHERE vol IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e34_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), l AS (
        |  SELECT event_type, cents,
        |         lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |           - us AS dur_us
        |  FROM e
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |       CAST(SUM(dur_us) AS BIGINT) AS span_us,
        |       CAST(SUM(cents * dur_us) AS BIGINT) AS weighted_cents,
        |       CAST(SUM(cents * dur_us) // SUM(dur_us) AS BIGINT) AS twap_cents
        |FROM l WHERE dur_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "s18_mips" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
        |  WHERE vec_id = 0
        |)
        |SELECT e.vec_id,
        |  ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe), 6)
        |    AS score
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
    "t37_char_profile" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS upper_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS digit_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS space_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS punct_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[^ -~]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS nonascii_permille
        |FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0
        |ORDER BY doc_id""".stripMargin,
    "t38_bigram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), d AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |         i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT bigram, COUNT(*) AS c FROM d GROUP BY 1
        |), head AS (
        |  SELECT bigram FROM c ORDER BY c DESC, bigram LIMIT 200
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(CASE WHEN h.bigram IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN h.bigram IS NULL THEN 1 ELSE 0 END)
        |            * 1000 // COUNT(*) AS BIGINT) AS novelty_permille
        |FROM d LEFT JOIN head h USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
    "e35_variant_extract" ->
      """SELECT event_type,
        |  CAST(COUNT(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_with_k,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t39_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT token, COUNT(*) AS c FROM tok
        |  WHERE length(token) > 0 GROUP BY 1
        |), r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank,
        |         SUM(c) OVER (ORDER BY c DESC, token
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c
        |), t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c)
        |SELECT CAST(rank AS BIGINT) AS vocab_size, CAST(cum AS BIGINT) AS covered,
        |       total, CAST(cum * 1000 // total AS BIGINT) AS coverage_permille
        |FROM r, t WHERE rank IN (5, 10, 15, 20, 25, 30)
        |ORDER BY vocab_size""".stripMargin,
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
    "e36_interarrival_hist" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |), g AS (
        |  SELECT event_type,
        |    (us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id))
        |      // 1000000 AS gap_s
        |  FROM e
        |), b AS (
        |  SELECT event_type, gap_s,
        |    CASE WHEN gap_s <= 0 THEN 0
        |         ELSE CAST(length(printf('%b', gap_s)) AS BIGINT) END AS bucket
        |  FROM g WHERE gap_s IS NOT NULL
        |)
        |SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
        |  CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
        |  CAST(CASE WHEN bucket = 0 THEN 0
        |       ELSE 1 << (bucket - 1) END AS BIGINT) AS lo_s,
        |  CAST(CASE WHEN bucket = 0 THEN 0
        |       ELSE (1 << bucket) - 1 END AS BIGINT) AS hi_s
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
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
    "g10_association_rules" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM op),
        |ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
        |pr AS (
        |  SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS co
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |), d AS (
        |  SELECT u AS ante, v AS cons, co FROM pr
        |  UNION ALL SELECT v AS ante, u AS cons, co FROM pr
        |)
        |SELECT d.ante, d.cons, d.co, ia.n_item AS n_ante, ib.n_item AS n_cons,
        |  CAST(d.co * 10000 // ia.n_item AS BIGINT) AS confidence_bp,
        |  CAST(d.co * n.n_orders * 1000 // (ia.n_item * ib.n_item) AS BIGINT)
        |    AS lift_permille
        |FROM d JOIN ic ia ON d.ante = ia.p JOIN ic ib ON d.cons = ib.p
        |CROSS JOIN n
        |ORDER BY lift_permille DESC, ante, cons LIMIT 50""".stripMargin,
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
    "a23_rfm_cells" ->
      """WITH pc AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |         CAST(COUNT(*) AS BIGINT) AS freq,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS monetary
        |  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1
        |), r AS (SELECT MAX(last_d) AS ref_d FROM pc),
        |s AS (
        |  SELECT o_custkey, CAST(ref_d - last_d AS BIGINT) AS recency_days,
        |         freq, monetary,
        |    ntile(5) OVER (ORDER BY ref_d - last_d, o_custkey) AS r_score,
        |    ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
        |    ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        |  FROM pc, r
        |)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |       CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score,
        |       CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(monetary) AS BIGINT) AS cell_cents,
        |       CAST(SUM(recency_days) // COUNT(*) AS BIGINT) AS avg_recency_days,
        |       CAST(SUM(freq) // COUNT(*) AS BIGINT) AS avg_orders
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "e37_peaks" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         epoch_us(ts) // 3600000000 AS bar,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, bar,
        |         arg_max(cents, CAST(us AS HUGEINT) * 1000000 + event_id)
        |           AS close
        |  FROM e GROUP BY 1, 2
        |), n AS (
        |  SELECT event_type, bar, close,
        |    lag(close) OVER w AS prev, lead(close) OVER w AS next
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bar)
        |), f AS (
        |  SELECT event_type, bar, close,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL
        |          AND close > prev AND close > next THEN 1 ELSE 0 END AS is_peak,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL
        |          AND close < prev AND close < next THEN 1 ELSE 0 END AS is_trough,
        |    CASE WHEN prev IS NOT NULL AND next IS NOT NULL THEN 1 ELSE 0 END
        |      AS decidable
        |  FROM n
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bars,
        |  CAST(SUM(decidable) AS BIGINT) AS n_decidable,
        |  CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
        |  CAST(SUM(is_trough) AS BIGINT) AS n_troughs,
        |  CAST(MAX(CASE WHEN is_peak = 1 THEN close END) AS BIGINT)
        |    AS highest_peak_cents,
        |  CAST(arg_max(bar, CASE WHEN is_peak = 1
        |       THEN close * 10000000 + bar END) AS BIGINT) AS highest_peak_bar
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "t40_source_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, t AS token FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |    FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        |  ) WHERE length(t) > 0
        |), sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM st GROUP BY 1
        |), i AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT i.source_a, i.source_b, i.n_common,
        |       za.n_tokens AS n_a, zb.n_tokens AS n_b,
        |       CAST(i.n_common * 1000 // (za.n_tokens + zb.n_tokens - i.n_common)
        |            AS BIGINT) AS jaccard_permille
        |FROM i JOIN sz za ON i.source_a = za.source
        |       JOIN sz zb ON i.source_b = zb.source
        |ORDER BY source_a, source_b""".stripMargin,
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
    "e38_diurnal_profile" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), h AS (
        |  SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM e GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total_events,
        |         CAST(SUM(cents) AS BIGINT) AS total_cents
        |  FROM h GROUP BY 1
        |)
        |SELECT h.event_type, h.hour_of_day, h.n_events, h.cents,
        |  CAST(h.n_events * 10000 // t.total_events AS BIGINT)
        |    AS event_share_bp,
        |  CAST(h.cents * 10000 // t.total_cents AS BIGINT) AS value_share_bp
        |FROM h JOIN t USING (event_type)
        |ORDER BY event_type, hour_of_day""".stripMargin,
    "e39_tenure_hist" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |), pu AS (
        |  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day,
        |         CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(day) - MIN(day) + 1 AS span_days
        |  FROM d GROUP BY 1
        |)
        |SELECT CAST((span_days - 1) // 7 AS BIGINT) AS week_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(SUM(n_active_days) AS BIGINT) AS active_days,
        |       CAST(SUM(n_active_days) * 1000 // SUM(span_days) AS BIGINT)
        |         AS density_permille
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq29_price_endings" ->
      """WITH e AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |), c AS (
        |  SELECT ending, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
        |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT ending, n, CAST(n * 10000 // total AS BIGINT) AS share_bp
        |FROM c, t ORDER BY n DESC, ending LIMIT 10""".stripMargin,
    "s19_label_cohesion" ->
      """WITH m AS (
        |  SELECT label, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
        |), d AS (
        |  SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM m
        |), s AS (
        |  SELECT label, i, CAST(SUM(v[i]) AS BIGINT) AS sd FROM d GROUP BY 1, 2
        |), a AS (
        |  SELECT label, CAST(SUM(sd * sd) AS BIGINT) AS norm_sum_sq
        |  FROM s GROUP BY 1
        |), q AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(list_sum(list_transform(v, x -> x * x))) AS BIGINT)
        |      AS sum_sq_norms
        |  FROM m GROUP BY 1
        |)
        |SELECT CAST(q.label AS BIGINT) AS label, q.n, q.sum_sq_norms,
        |  a.norm_sum_sq,
        |  CAST(a.norm_sum_sq - q.sum_sq_norms AS BIGINT) AS pair_dot_sum,
        |  CAST(q.n * (q.n - 1) AS BIGINT) AS n_pairs,
        |  CAST((a.norm_sum_sq - q.sum_sq_norms) // (q.n * (q.n - 1)) AS BIGINT)
        |    AS avg_pair_dot_milli2
        |FROM q JOIN a USING (label) WHERE q.n >= 2
        |ORDER BY label""".stripMargin,
    "e40_conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IN ('view', 'purchase')
        |), f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN us END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase' THEN us END) AS first_purchase
        |  FROM e GROUP BY 1
        |), l AS (
        |  SELECT user_id, first_view, first_purchase,
        |    CASE WHEN first_purchase >= first_view
        |         THEN (first_purchase - first_view) // 1000000 END AS lag_s
        |  FROM f WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |), b AS (
        |  SELECT CASE WHEN first_purchase < first_view THEN -1
        |         WHEN lag_s <= 0 THEN 0
        |         ELSE CAST(length(printf('%b', lag_s)) AS BIGINT) END AS bucket,
        |         lag_s
        |  FROM l
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(MIN(lag_s) AS BIGINT) AS min_lag_s,
        |       CAST(MAX(lag_s) AS BIGINT) AS max_lag_s
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "e41_retractable_agg" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |    strpos('0123456789abcdef',
        |           substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1 AS n1,
        |    strpos('0123456789abcdef',
        |           substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1 AS n2
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), b AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS b_cnt,
        |    CAST(SUM(cents) AS BIGINT) AS b_sum,
        |    MIN(cents) AS b_min, MAX(cents) AS b_max
        |  FROM e WHERE n1 < 12 GROUP BY 1
        |), d AS (
        |  SELECT event_type,
        |    CAST(SUM(w) AS BIGINT) AS d_cnt,
        |    CAST(SUM(w * cents) AS BIGINT) AS d_sum,
        |    MIN(CASE WHEN w = 1 THEN cents END) AS ins_min,
        |    MAX(CASE WHEN w = 1 THEN cents END) AS ins_max,
        |    MIN(CASE WHEN w = -1 THEN cents END) AS del_min,
        |    MAX(CASE WHEN w = -1 THEN cents END) AS del_max
        |  FROM (
        |    SELECT event_type, cents, 1 AS w FROM e WHERE n1 >= 12
        |    UNION ALL
        |    SELECT event_type, cents, -1 AS w FROM e WHERE n1 < 12 AND n2 >= 12
        |  ) GROUP BY 1
        |), t AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_cnt,
        |    CAST(SUM(cents) AS BIGINT) AS t_sum,
        |    MIN(cents) AS t_min, MAX(cents) AS t_max
        |  FROM e WHERE (n1 < 12 AND n2 < 12) OR n1 >= 12 GROUP BY 1
        |)
        |SELECT event_type,
        |  CAST(COALESCE(b_cnt, 0) + COALESCE(d_cnt, 0) AS BIGINT) AS cnt,
        |  CAST(COALESCE(b_sum, 0) + COALESCE(d_sum, 0) AS BIGINT)
        |    AS total_cents,
        |  CAST(t_min AS BIGINT) AS min_cents, CAST(t_max AS BIGINT) AS max_cents,
        |  (del_min IS NOT NULL AND del_min <= b_min) AS rescan_min,
        |  (del_max IS NOT NULL AND del_max >= b_max) AS rescan_max,
        |  ((COALESCE(b_cnt, 0) + COALESCE(d_cnt, 0)) = t_cnt
        |   AND (COALESCE(b_sum, 0) + COALESCE(d_sum, 0)) = t_sum
        |   AND ((del_min IS NOT NULL AND del_min <= b_min) OR
        |        (CASE WHEN b_min IS NULL THEN ins_min
        |              WHEN ins_min IS NULL THEN b_min
        |              ELSE least(b_min, ins_min) END) = t_min)
        |   AND ((del_max IS NOT NULL AND del_max >= b_max) OR
        |        (CASE WHEN b_max IS NULL THEN ins_max
        |              WHEN ins_max IS NULL THEN b_max
        |              ELSE greatest(b_max, ins_max) END) = t_max)) AS matches
        |FROM b
        |FULL OUTER JOIN d USING (event_type)
        |FULL OUTER JOIN t USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // Semantic twin of the packed-BIGINT xor/bit_count path: Hamming =
    // #{dims where the sign bits differ}, which is exactly what the two
    // 32-bit words' popcounted xor computes.
    "s20_hamming_prerank" ->
      """WITH base AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m,
        |    list_transform(embedding,
        |      x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS sgn
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64
        |), q AS (
        |  SELECT vec_id AS q_id, m AS qm, sgn AS qsgn FROM base WHERE vec_id < 8
        |), pairs AS (
        |  SELECT q.q_id, b.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      j -> CASE WHEN b.sgn[j] <> q.qsgn[j] THEN 1 ELSE 0 END))
        |      AS BIGINT) AS ham,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      j -> b.m[j] * q.qm[j])) AS BIGINT) AS dot
        |  FROM base b, q WHERE b.vec_id <> q.q_id
        |), pre AS (
        |  SELECT q_id, vec_id, ham FROM pairs
        |  QUALIFY row_number() OVER (PARTITION BY q_id
        |    ORDER BY ham ASC, vec_id ASC) <= 50
        |), ex AS (
        |  SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY dot DESC, vec_id ASC) AS rd
        |  FROM pairs
        |  QUALIFY rd <= 10
        |)
        |SELECT ex.q_id,
        |  CAST(COUNT(CASE WHEN pre.ham IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS hits,
        |  bool_or(CASE WHEN ex.rd = 1 THEN pre.ham IS NOT NULL END)
        |    AS top1_in_prerank,
        |  CAST(MAX(CASE WHEN ex.rd = 1 THEN ex.vec_id END) AS BIGINT)
        |    AS exact_top1,
        |  CAST(MIN(pre.ham) AS BIGINT) AS best_recalled_ham
        |FROM ex LEFT JOIN pre USING (q_id, vec_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e42_bitemporal" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS pr,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d0,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    strpos('0123456789abcdef',
        |      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS n1,
        |    strpos('0123456789abcdef',
        |      substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1 AS n2
        |  FROM orders
        |), a AS (
        |  SELECT k, pr, d0 AS txn, d0 AS vd, cents FROM o
        |  UNION ALL
        |  SELECT k, pr, d0 + 10, d0 - 5, cents + 500 FROM o WHERE n1 < 4
        |  UNION ALL
        |  SELECT k, pr, d0 + 20, d0, CAST(0 AS BIGINT) FROM o WHERE n2 < 2
        |), perkey AS (
        |  SELECT k, pr,
        |    arg_max(cents, txn)
        |      FILTER (WHERE txn <= (DATE '1995-06-01' - DATE '1970-01-01')
        |              AND vd <= (DATE '1995-06-01' - DATE '1970-01-01'))
        |      AS c_asof,
        |    COUNT(*) FILTER (
        |      WHERE txn <= (DATE '1995-06-01' - DATE '1970-01-01')
        |        AND vd <= (DATE '1995-06-01' - DATE '1970-01-01')) AS n_asof,
        |    arg_max(cents, txn)
        |      FILTER (WHERE vd <= (DATE '1995-06-01' - DATE '1970-01-01'))
        |      AS c_fin,
        |    COUNT(*) FILTER (
        |      WHERE vd <= (DATE '1995-06-01' - DATE '1970-01-01')) AS n_fin
        |  FROM a GROUP BY 1, 2
        |)
        |SELECT pr AS o_orderpriority,
        |  CAST(COUNT(CASE WHEN n_asof > 0 THEN 1 END) AS BIGINT) AS n_known,
        |  CAST(SUM(CASE WHEN n_asof > 0 THEN c_asof END) AS BIGINT)
        |    AS cents_known,
        |  CAST(COUNT(CASE WHEN n_fin > 0 THEN 1 END) AS BIGINT) AS n_final,
        |  CAST(SUM(CASE WHEN n_fin > 0 THEN c_fin END) AS BIGINT)
        |    AS cents_final,
        |  CAST(COUNT(CASE WHEN n_asof > 0 AND n_fin > 0
        |                  AND c_asof <> c_fin THEN 1 END) AS BIGINT)
        |    AS n_revised
        |FROM perkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "t41_readability" ->
      """WITH s AS (
        |  SELECT lang,
        |    greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |      AS BIGINT), 1) AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS snt,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), sc AS (
        |  SELECT lang, w,
        |    206835 - (1015 * w) // snt - (84600 * syl) // w AS score_milli
        |  FROM s
        |)
        |SELECT lang, CAST(score_milli // 10000 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_words,
        |  CAST(MIN(score_milli) AS BIGINT) AS min_score_milli,
        |  CAST(MAX(score_milli) AS BIGINT) AS max_score_milli
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "g11_lpa_communities" -> {
      // 3 unrolled synchronous rounds; the window argmax (count DESC,
      // label ASC) is the oracle's formulation of the engine's
      // partial-aggregable max(struct(count, -label))
      val rounds = (1 to 3).map { t =>
        s"""l$t AS MATERIALIZED (
           |  SELECT node, lbl FROM (
           |    SELECT e.u AS node, l.lbl, COUNT(*) AS c,
           |      row_number() OVER (PARTITION BY e.u
           |        ORDER BY COUNT(*) DESC, l.lbl ASC) AS rn
           |    FROM e JOIN l${t - 1} l ON l.node = e.v
           |    GROUP BY e.u, l.lbl
           |  ) WHERE rn = 1)""".stripMargin
      }.mkString(",\n", ",\n", "\n")
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT a.p AS u, b.p AS v FROM op a JOIN op b
        |       ON a.o = b.o AND a.p < b.p
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e)""".stripMargin +
        rounds +
        """SELECT CAST(lbl AS BIGINT) AS community,
          |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
          |  CAST(MIN(node) AS BIGINT) AS min_node
          |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin
    },
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
    "e43_pattern_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS str
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(str, 'vc*p')) AS BIGINT) AS n_paths,
        |  CAST(len(regexp_extract_all(str, 'vc+p')) AS BIGINT) AS n_assisted,
        |  CAST(COALESCE(list_max(list_transform(
        |    regexp_extract_all(str, 'vc*p'), m -> len(m) - 2)), 0) AS BIGINT)
        |    AS max_clicks_in_path
        |FROM s ORDER BY user_id""".stripMargin,
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
    "e44_busday_lag" ->
      """WITH fs AS (
        |  SELECT l_orderkey,
        |    CAST(MIN(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS ship_day
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
        |), j AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS order_day,
        |    ship_day
        |  FROM orders JOIN fs ON o_orderkey = l_orderkey
        |), lagged AS (
        |  SELECT o_orderpriority,
        |    (5 * (ship_day // 7) + ([0, 1, 2, 2, 2, 3, 4])[(ship_day % 7) + 1])
        |    - (5 * (order_day // 7) + ([0, 1, 2, 2, 2, 3, 4])[(order_day % 7) + 1])
        |      AS busdays
        |  FROM j
        |)
        |SELECT o_orderpriority, CAST(busdays AS BIGINT) AS busdays,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
