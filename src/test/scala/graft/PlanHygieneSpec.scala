package graft

/** Whole-registry hygiene: every registered query must (a) ANALYZE AND
  * PLAN against the smallest fixture — the cheap net that would have
  * caught the round-7 fixture-type drift as one failing test instead of
  * 23 opaque downstream errors — and (b) never plan a cartesian
  * product (CartesianGuard turns the accidental ones into plan-time
  * errors; this pins that no query ships with a deliberate hint
  * either). Also pins the queries↔oracle registry consistency: a
  * typo'd oracle key would otherwise silently demote a query to the
  * weaker rows-only check.
  */
class PlanHygieneSpec extends SparkTestBase {

  test("oracle registry matches the query registry; every query is oracled") {
    // r9: the last 5 rows-only entries were retired (each has a hash-green
    // derandomized twin), so the gate is 100% oracle-checked — any new
    // un-oracled registry entry is now a test failure, not a weaker check.
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracle SQL with no matching query (typo?): $orphanOracles")
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty,
      s"queries without oracle SQL: $unchecked")
  }

  /** Queries allowed to plan a partition-less Window (the single-reducer
    * sort shape), each with the bounded domain that justifies it — every
    * entry's window input is metadata-scale (a value/calendar/checkpoint
    * domain or a ≤k survivor set), never a data-scale row domain. The
    * r9 offenders (global ntile/row_number over CUSTOMERS in a23/dq28,
    * running sum over PARTS in a30) were rewritten in r10 onto the
    * count-based order-statistic / two-level bucket refinement patterns;
    * this gate is the net that keeps the class from recurring: a new
    * query with an unlisted (or a listed query with a changed count of)
    * global window fails here and must either re-derive its frame from a
    * bounded domain or justify itself in this map.
    */
  private val globalWindowWhitelist: Map[String, (Int, String)] = Map(
    "a18_sliding_hll" -> ((1, "calendar-day domain: sliding frame over per-day sketch partials")),
    "a21_share_tree" -> ((1, "nation-region aggregate (|nations| rows)")),
    "a23_rfm_cells" -> ((3, "distinct recency days + distinct order counts + <=64Ki monetary value buckets (r10 rewrite)")),
    "a30_abc_classes" -> ((2, "<=64Ki revenue value buckets + 3-row class rollup (r10 rewrite)")),
    "a31_order_size_mix" -> ((2, "distinct order-price cents (price-domain-bounded histogram)")),
    "d33_temperature_mix" -> ((3, "per-source mixture frame (|sources| rows)")),
    "dq28_concentration" -> ((1, "<=64Ki revenue value buckets (r10 rewrite)")),
    "dq4_outlier_gate" -> ((2, "distinct-cents histogram (price-domain-bounded)")),
    "e48_kaplan_meier" -> ((1, "distinct tenure-day risk-set checkpoints (calendar-bounded)")),
    "e49_linear_interp" -> ((1, "calendar-day spine gap fill")),
    "e52_adoption_curve" -> ((1, "calendar-day cumulative adoption")),
    "e55_open_orders" -> ((1, "calendar-day open/close deltas running net")),
    "g1_pagerank" -> ((1, "rank stamp over the <=k TakeOrdered survivors")),
    "j21_q15_topsupplier" -> ((1, "supplier-aggregated revenue view (documented deliberate at JoinOps.q15TopSupplier)")),
    "k3_range_planner" -> ((2, "file/bin layout-metadata frame")),
    "o_skyline" -> ((2, "price-bucket maxima + bucket-pruned skyline candidates")),
    "s14_rrf_fusion" -> ((2, "two <=kEach retrieval result lists")),
    "t22_bm25" -> ((1, "rank stamp over the <=k TakeOrdered survivors")),
    "t35_quality_cut" -> ((1, "distinct quality-score histogram (score-domain-bounded)")),
    "t39_vocab_coverage" -> ((1, "aggregated vocabulary, not the corpus (documented at TextOps.vocabCoverage)")),
    "t42_vocab_growth" -> ((1, "<=|checkpoints| vocab-growth bins")),
  )

  /** §R10.12 alias-inlining gate — kernel list and matcher live in
    * [[PlanKernels]], SHARED with the `graft.JoinCondAudit` dev probe so
    * the two sweeps can never drift, and counting `kernel(` call sites
    * at identifier boundaries so `minhash(` no longer matches inside
    * `minhash_tokens(`.
    */
  private def repeatedKernelLines(plan: String): Seq[String] =
    PlanKernels.repeatedKernelLines(plan).map(_.take(220))

  test("every registered query plans on sf0.001 with no cartesian product, " +
    "no unjustified partition-less window, and no repeated expensive " +
    "kernel in a join condition or filter") {
    import org.apache.spark.sql.execution.window.WindowExec
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val observed = scala.collection.mutable.Map.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sf0001).queryExecution
        if (qe.executedPlan.toString.contains("CartesianProduct"))
          failures += s"$name: plans a CartesianProduct"
        repeatedKernelLines(qe.executedPlan.toString).foreach { l =>
          failures += s"$name: expensive kernel repeated in one condition " +
            s"(evaluated per occurrence per row — fuse it): $l"
        }
        val n = qe.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) observed(name) = n
      } catch {
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(1).mkString.take(200)
      }
    }
    val expected = globalWindowWhitelist.map { case (k, (n, _)) => k -> n }
    val unjustified = observed.toMap.filter { case (k, n) =>
      !expected.get(k).contains(n)
    }
    val stale = expected.filter { case (k, n) =>
      !observed.get(k).contains(n)
    }
    if (unjustified.nonEmpty)
      failures += "partition-less Window with no whitelist justification " +
        "(single-reducer sort at scale — derive the frame from a bounded " +
        s"domain, or justify it in globalWindowWhitelist): $unjustified"
    if (stale.nonEmpty)
      failures += s"stale globalWindowWhitelist entries (plan changed): $stale"
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
