package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join inventory — parity surface (SURVEY.md §2.7): the reference has
  * zero joins, but its Athena-SQL consumption layer
  * (`/root/reference/README.md:17`, Req. 8) implies standard equi-joins
  * over the star schema.
  *
  * Scale notes (100 TB):
  *  - Dimension joins use explicit `broadcast()` — no shuffle of the fact
  *    side, the dim ships to every executor once.
  *  - Fact-fact joins (lineitem⋈orders) are shuffle/sort-merge on the join
  *    key; with AQE on, skewed keys are split at runtime.
  *  - Semi/anti joins express EXISTS/NOT EXISTS without materializing the
  *    right side's payload columns.
  */
object JoinOps {

  /** Broadcast equi-join of two dims: nation⋈region. */
  def broadcastDim(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"), "inner")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** Shuffle (sort-merge) fact⋈fact join + aggregate: lineitem⋈orders.
    * Money in integer cents (see [[starJoin]]): with only 5 priority
    * groups, each group sums MILLIONS of doubles at scale — the
    * round-a-double-sum form is exactly the half-cent-boundary class the
    * 10x gate caught on j6.
    */
  def factJoin(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "inner")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        (sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          / lit(100.0)).as("revenue"))
      .orderBy("o_orderpriority")

  /** Left outer join keeping unmatched left rows: customer⋈orders counts. */
  def leftOuter(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** Semi-join (EXISTS): orders having at least one high-quantity line. */
  def semiJoin(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.filter(col("l_quantity") > 45),
        orders("o_orderkey") === lineitem("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Anti-join (NOT EXISTS): customers with no orders. */
  def antiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** AS-OF join — for each left row, the most recent right row at or
    * before its time, per key. Spark has no native as-of join; preference
    * ladder tier (a): COMPOSE existing operators — tag both sides, union,
    * one windowed `last(_, ignoreNulls)` carry-forward, filter left rows.
    *
    * Scale shape: ONE shuffle (hash by key) + one sort — same cost as a
    * single window query, no range-join row explosion and no per-row
    * right-side probe. This is the plan a native AsOfJoinExec would want.
    *
    * Right rows sort BEFORE left rows at equal time (tag 0 < 1), giving
    * inclusive `left.time >= right.time` semantics (DuckDB ASOF parity).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String], outPrefix: String = "asof_",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"asofJoin: direction must be backward|forward, got '$direction'")
    require(tolerance.forall(_ >= 0L), "asofJoin: tolerance must be >= 0")
    val internal = Seq("_t", "_tag", "_r_row", "_matched", "_mt")
    require(internal.forall(c => !left.columns.contains(c)),
      s"left input must not contain internal columns ${internal.mkString(", ")}")
    require(rightCols.forall(c => !left.columns.contains(outPrefix + c)),
      s"output columns ${rightCols.map(outPrefix + _).mkString(", ")} collide with left input")
    // The matched right row travels as ONE struct: the struct is non-null
    // for every right row even when its fields are null, so
    // last(ignoreNulls) carries the row ATOMICALLY — per-column carry
    // would skip a matched row's null field and resurrect a stale value
    // from an older row (and could mix columns across rows).
    //
    // Direction is purely the SCAN ORDER of the merged stream:
    // backward (pandas merge_asof default) walks time ascending and
    // carries the latest right row at-or-before; forward walks time
    // DESCENDING and the same carry yields the earliest right row
    // at-or-after. Right rows sort before left at equal timestamps in
    // both directions, keeping the match inclusive.
    val rTagged = right.select(col(key), col(time).as("_t"),
      struct(rightCols.map(col): _*).as("_r_row"))
      .withColumn("_tag", lit(0))
    val lTagged = left.withColumn("_t", col(time)).withColumn("_tag", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val timeOrder = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(key).orderBy(timeOrder, col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_matched", last(col("_r_row"), ignoreNulls = true).over(w))
      .withColumn("_mt",
        last(when(col("_tag") === 0, col("_t")), ignoreNulls = true).over(w))
    // pandas merge_asof tolerance: a carried match further than
    // `tolerance` time units away reverts to no-match. The gap is always
    // non-negative in scan order (backward: l.t - r.t; forward: r.t - l.t).
    val inTolerance = tolerance.fold(lit(true)) { tol =>
      val gap = if (direction == "backward") col("_t") - col("_mt")
                else col("_mt") - col("_t")
      col("_mt").isNotNull && gap <= tol
    }
    filled.filter(col("_tag") === 1)
      .select(col("*") +: rightCols.map(c =>
        when(inTolerance, col("_matched").getField(c)).as(outPrefix + c)): _*)
      .drop("_r_row", "_matched", "_tag", "_t", "_mt")
  }

  /** Skew-resistant equi-join via key salting: the skewed (fact) side gets
    * a deterministic salt derived from other columns, the small side is
    * replicated `saltFactor`× — a hot key's rows spread over `saltFactor`
    * reducers instead of melting one task. (AQE's skew-join split handles
    * sort-merge cases adaptively; explicit salting is the portable fix and
    * the only one available inside a single stage at 100 TB extremes.)
    *
    * `saltSource` must be deterministic per row (e.g. a row id) — never
    * `rand()`, which breaks retry/replay semantics.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltSource: org.apache.spark.sql.Column, saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Registered-query harness (j11): per-nation line counts + revenue
    * through [[saltedJoin]] on the fact-side supplier key — the oracle is
    * the PLAIN join, so the hash gate proves salting is semantics-
    * preserving (no row lost, duplicated, or mis-keyed by the salt).
    *
    * On the fixture Spark would happily broadcast the supplier side and
    * salting is then pure overhead — the technique earns its keep when
    * the "small" side exceeds the broadcast threshold AND one fact key is
    * hot enough to melt a single SMJ reducer (the 100 TB regime AQE's
    * skew split can't always reach, e.g. inside a single stage). The
    * salt source is (l_orderkey, l_linenumber) — the fact's row identity:
    * deterministic under retry, unlike rand().
    */
  def saltedSupplierRevenue(lineitem: DataFrame, supplier: DataFrame,
      saltFactor: Int = 8): DataFrame =
    saltedJoin(
      lineitem.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount")),
      supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
      "l_suppkey",
      struct(col("l_orderkey"), col("l_linenumber")),
      saltFactor)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      .orderBy("s_nationkey")

  /** FACT-FACT TIME-PROXIMITY JOIN via interval binning (j12) — the
    * band/bucketing strategy [[rangeJoin]]'s scaladoc promises: for every
    * `error` event, the count of the same user's `click` events within
    * ±`windowUs`. Neither side is broadcastable at 100 TB and a naive
    * |Δt| ≤ W condition is a per-user cross product; binning makes it an
    * EQUI-join: both sides bucket by ⌊t/W⌋, the probe side expands to its
    * 3 neighboring buckets (constant factor — |Δt| ≤ W confines a match
    * to bucket distance ≤ 1), the join keys on (user, bucket), and the
    * exact |Δt| filter runs inside the join condition. Each qualifying
    * pair surfaces EXACTLY once (the click's single bucket equals exactly
    * one probed bucket), so no dedup pass. Zero-click errors stay in the
    * output via the final left join — absence is signal in an
    * error-correlation report.
    */
  def proximityJoin(events: DataFrame, windowUs: Long = 300000000L): DataFrame = {
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val errors = base.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us"),
        expr(s"us div $windowUs").as("bucket"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"),
        expr(s"us div $windowUs").as("c_bucket"))
    val probed = errors.select(col("event_id"), col("user_id"), col("us"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
        .as("probe"))
    val counts = probed.join(clicks,
        col("user_id") === col("c_user") && col("probe") === col("c_bucket") &&
          abs(col("us") - col("c_us")) <= windowUs)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
    errors.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_near_clicks"))
      .orderBy("event_id")
  }

  /** Non-equi (range) join: bucket events by value range. The range table
    * is a tiny literal relation → broadcast nested-loop is the RIGHT plan
    * here (small side × stream); a fact-fact range join would instead need
    * a band/bucketing strategy.
    */
  def rangeJoin(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val buckets = Seq(
      ("low", 0.0, 100.0), ("mid", 100.0, 300.0), ("high", 300.0, 1e9))
      .toDF("bucket", "lo", "hi")
    events
      .join(broadcast(buckets),
        events("value") >= buckets("lo") && events("value") < buckets("hi"),
        "inner")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("min_v"),
        round(max("value"), 2).as("max_v"))
      .orderBy("bucket")
  }

  /** Filter → join → aggregate → top-k (TPC-H Q3-shaped): revenue of the
    * 10 biggest orders in a market segment. Filters apply BEFORE the join
    * (Catalyst pushes them to both scans), top-k is TakeOrderedAndProject.
    */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String, k: Int): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      // NO broadcast hint on customer: it scales linearly with the fact
      // tables (~1.5 TB at the 100 TB point) and a forced broadcast would
      // override the size threshold that protects executors from OOM.
      // AQE still broadcasts the segment-filtered side when it measures
      // small at runtime — the hint was redundant locally, unsafe at scale.
      .join(customer.filter(col("c_mktsegment") === segment),
        orders("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      // integer cents (see starJoin) — revenue is also the top-k SORT key,
      // so an FP-sum wobble here would reorder the result, not just
      // misprint a cent
      .agg((sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          / lit(100.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)

  /** Star join: fact + dims, revenue per region (TPC-H Q5-shaped).
    * nation/region are genuinely BOUNDED dims (25/5 rows at any scale) —
    * explicit broadcast is always right for them. customer is NOT bounded
    * (it grows with the fact tables), so it carries no hint: Catalyst/AQE
    * broadcast it while its measured size is under threshold and fall back
    * to shuffle join beyond — the safe behavior at 100 TB.
    *
    * Money is summed in integer CENTS (per-row round, then exact BIGINT
    * sum, then one double division) — `round(sum(double), 2)` passed the
    * gate through sf0.1 but a 10x group crossed a half-cent boundary at
    * sf1 (engines sum doubles in different orders; Spark's own partial-agg
    * order isn't even deterministic). Same discipline as [[marketShare]].
    */
  def starJoin(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_lines"),
        (sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          / lit(100.0)).as("revenue"))
      .orderBy("r_name")

  /** TPC-H Q5-shaped SIX-table join — the one join graph the star join
    * lacks: the supplier edge closes a CYCLE (`c_nationkey = s_nationkey`
    * constrains customer and supplier to the same nation), so the
    * optimizer must order a join DAG, not a tree. Local-supplier revenue
    * per nation inside one region and one order-date year.
    *
    * Scale shape: the two fact edges (lineitem⋈orders, ⋈supplier-filtered
    * rows) shuffle; nation/region broadcast and their region filter
    * prunes customer/supplier BEFORE the fact joins (predicate pushdown
    * through the dimension chain); supplier is tiny and broadcasts. Money
    * is summed in integer cents from an expression both engines evaluate
    * with identical IEEE steps.
    */
  def localSupplierRevenue(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String = "ASIA",
      year: Int = 1996): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey")
        && customer("c_nationkey") === supplier("s_nationkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .filter(col("r_name") === regionName
        && org.apache.spark.sql.functions.year(col("o_orderdate")) === year)
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))

  /** MARKET SHARE (j17, the TPC-H Q8 shape): per order-year, the share
    * of total revenue flowing through one nation's suppliers, as an
    * integer PERMILLE — conditional aggregation over a fact-dim star,
    * with the share arithmetic kept engine-exact: per-row revenue is
    * rounded to integer cents once (the identical IEEE expression on
    * both engines), all sums are BIGINT, and the share is a floor
    * integer division, so no cross-engine FP division ever happens.
    *
    * Scale shape: one fact-fact equi-join (lineitem⋈orders, both sides
    * hash-partitioned on the order key) and two broadcast dims; the
    * conditional share needs NO second pass — `sum(when)` rides the
    * same partial aggregate as the total.
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      targetNation: String = "NATION_7"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(year(col("o_orderdate")).as("yr"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"),
        (col("n_name") === targetNation).as("is_target"))
      .groupBy("yr")
      .agg(sum(col("cents")).as("total_cents"),
        sum(when(col("is_target"), col("cents")).otherwise(0L))
          .as("nation_cents"))
      .select(col("yr"), col("total_cents"), col("nation_cents"),
        expr("nation_cents * 1000 div total_cents").as("share_permille"))
      .orderBy("yr")

  /** TPC-H Q18 shape ("large-volume customers"): aggregate the FACT table
    * first (per-order total quantity), filter to the rare heavy orders,
    * and only then join orders + customer — the aggregate-below-join
    * ordering that turns a fact-fact join into a join against a
    * HAVING-filtered sliver. At 100 TB the pre-aggregation is the whole
    * plan: lineitem collapses map-side to one row per order and the > t
    * filter drops ~99% of those before anything reaches a join; joining
    * first would shuffle the full fact table twice for rows mostly
    * destined for the HAVING bin.
    *
    * Quantities round to exact integers (TPC-H quantities are integral),
    * money to cents; top-k is TakeOrderedAndProject on (cents, orderkey).
    */
  def q18BigSpenders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, minQty: Long = 200L, k: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q17 shape ("small-quantity-order revenue"): revenue locked in
    * lines whose quantity is below 20% of their part's average — the
    * canonical CORRELATED-AVERAGE query. The decorrelated form computes
    * the per-part aggregate once and joins it back; because the probe is
    * restricted to ONE brand, the per-part (sum, count) table is a few
    * hundred rows and BROADCASTS, so the fact table is touched exactly
    * once with no shuffle at all (the brand part list broadcasts too).
    * At 100 TB the correlated-subquery formulation would re-aggregate
    * the part's lines per outer row; this is the plan a decorrelation
    * rule must reach, written directly.
    *
    * Engine-exact arithmetic: quantities are integral after rounding, so
    * `qty < 0.2 * avg` is cross-multiplied to `5 * qty * cnt < sum` —
    * strict integer comparison, no FP division on either engine. Revenue
    * is per-row integer cents; the weekly figure is a floor division.
    */
  def q17SmallQtyRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#4"): DataFrame = {
    val brandParts = part.filter(col("p_brand") === brand)
      .select("p_partkey")
    val brandLines = lineitem
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    // The aggregate-then-join-back form scans the fact table TWICE (the
    // per-part stats leg and the probe leg can't share an exchange). A
    // whole-partition window over the brand subset computes the same
    // (sum, count) without reducing rows: ONE lineitem scan, one
    // exchange on the part key, both window functions in one WindowExec.
    val perPart = Window.partitionBy("l_partkey")
    brandLines
      .withColumn("sum_qty", sum(col("qty")).over(perPart))
      .withColumn("cnt", count(lit(1)).over(perPart))
      .filter(col("qty") * col("cnt") * 5 < col("sum_qty"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("price_cents")).as("total_cents"))
      .select(lit(brand).as("brand"), col("n_lines"), col("total_cents"),
        expr("total_cents div 7").as("avg_weekly_cents"))
  }

  /** TPC-H Q21 shape ("suppliers who kept orders waiting", adapted): for
    * finished orders, suppliers who were the ONLY late supplier on a
    * multi-supplier order. The fixture has no commit/receipt dates, so
    * "late" is `l_shipdate > o_orderdate + lateDays` — same line-level
    * predicate role, same EXISTS (another supplier) + NOT EXISTS (another
    * late supplier) structure.
    *
    * The textbook formulation self-joins the fact table twice (l2, l3).
    * This implementation replaces BOTH self-joins with one per-order
    * aggregate: n_supp (distinct suppliers), n_late_supp (distinct late
    * suppliers), n_late_lines, and — exploiting `n_late_supp = 1` — the
    * lone late supplier via `max(when(late, suppkey))`. The EXISTS is
    * `n_supp >= 2`, the NOT-EXISTS is `n_late_supp = 1`, and the Q21
    * per-l1-row count is `sum(n_late_lines)` per supplier. One exchange
    * on the order key + one on the supplier key — at 100 TB that is two
    * fact-table shuffles saved relative to the l2/l3 joins, and no
    * skewed self-join keys.
    */
  def q21WaitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 1500, k: Int = 100): DataFrame = {
    val lines = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate").cast("date") >
          date_add(col("o_orderdate").cast("date"), lateDays)).as("is_late"))
    // Two distinct-counts in one aggregate would plan an Expand that
    // replicates every row per distinct column; the two-level form
    // (collapse to (order, supplier) grain first, then count plain rows)
    // computes the same distincts with map-side partial aggregation and
    // no row replication.
    val perSupp = lines
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("is_late")).as("supp_late"),
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_supp_late_lines"))
    val perOrder = perSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"),
        sum(when(col("supp_late"), col("n_supp_late_lines")).otherwise(0L))
          .as("n_late_lines"),
        max(when(col("supp_late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    perOrder
      .groupBy(col("late_supp"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .join(broadcast(supplier), col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q15 shape ("top supplier"): per-supplier revenue over one
    * shipdate quarter, returning every supplier whose revenue EQUALS the
    * global maximum — the view-plus-max-join shape. The revenue view is
    * computed ONCE and reused for both the max and the probe (Spark
    * plans the reuse as an exchange-reuse; the max side collapses to one
    * row and broadcasts back, so the "second scan" costs one row). Ties
    * all surface, per the spec. Integer cents throughout; the quarter
    * filter pushes to the parquet scan as a shipdate range.
    */
  def q15TopSupplier(lineitem: DataFrame, supplier: DataFrame,
      qStart: String = "1998-01-01", qEnd: String = "1998-04-01"): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate").cast("date") >= lit(qStart).cast("date") &&
        col("l_shipdate").cast("date") < lit(qEnd).cast("date"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
    // A separate max-aggregate leg re-evaluates the revenue view (two
    // fact scans — ReuseExchange doesn't fire across the differing
    // downstream shapes). A whole-partition window max over the
    // AGGREGATED view touches |suppliers| rows — metadata scale next to
    // the fact table — so the single-partition WindowExec it plans is
    // deliberate, not a defect, and the fact table is scanned once.
    revenue
      .withColumn("max_cents",
        max(col("revenue_cents")).over(Window.partitionBy()))
      .filter(col("revenue_cents") === col("max_cents"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22 shape ("global sales opportunity"): customers from a
    * nation subset whose balance beats the subset's positive-balance
    * average and who have NO orders — the scalar-aggregate-subquery +
    * anti-join combination. The scalar (sum, count) pair is a one-row
    * aggregate broadcast-crossed into the probe (Spark plans the
    * textbook correlated form the same way only after subquery rewrite;
    * this is that plan written directly), then a LEFT ANTI against
    * orders carrying only o_custkey.
    *
    * Engine-exact: `bal > avg` is FP-unsafe (sum/count division rounds
    * differently per engine), so balances are rounded to integer cents
    * once and the comparison is cross-multiplied: `cents·cnt >
    * sum_cents`. At 100 TB the anti-join shuffles orders' KEY COLUMN
    * only — the projection matters, o_custkey is a fraction of the
    * orders row — and the customer side is already the small side.
    */
  def q22SalesOpportunity(customer: DataFrame, orders: DataFrame,
      nations: Seq[Int] = Seq(0, 3, 7, 11, 14, 18, 21)): DataFrame = {
    val pool = customer
      .filter(col("c_nationkey").isin(nations.map(Int.box): _*))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val stats = pool.filter(col("cents") > 0L)
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("cnt"))
    pool
      .crossJoin(broadcast(stats))
      .filter(col("cents") * col("cnt") > col("sum_cents"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("total_cents"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q4 shape ("order priority checking"): orders placed in one
    * quarter that had at least one line shipped after the order date
    * (the fixture's late-commit analog), counted by priority class. The
    * EXISTS is a LEFT SEMI join whose extra non-equi term rides the
    * same sort-merge/hash join as the key — the right side contributes
    * only (l_orderkey, l_shipdate) and each order short-circuits at its
    * first qualifying line, so no per-order line counts are ever built.
    * The quarter filter prunes the orders scan before the join.
    */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame,
      qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): DataFrame =
    orders
      .filter(col("o_orderdate").cast("date") >= lit(qStart).cast("date") &&
        col("o_orderdate").cast("date") < lit(qEnd).cast("date"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate").cast("date") > col("o_orderdate").cast("date"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q7 shape ("volume shipping"): bilateral trade revenue between
    * two nations, by supplier nation × customer nation × ship year. The
    * nation dim joins twice in different ROLES (supplier's vs
    * customer's) — both broadcast, pre-filtered to the two nations of
    * interest so the fact rows drop at the earliest join instead of in
    * a post-join filter. customer is NOT broadcast (at scale it's a
    * large dim; the o_custkey join shuffles on the key), supplier is.
    */
  def q7NationVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String = "NATION_3", nationB: String = "NATION_7"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val supN = supplier.join(
      broadcast(nation.filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
      col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custN = customer.join(
      broadcast(nation.filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))),
      col("c_nationkey") === col("nk2"))
      .select(col("c_custkey"), col("cust_nation"))
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q9 shape ("product type profit"): profit by supplier nation ×
    * order year over the parts whose name contains a token. The fixture
    * has no partsupp, so supply cost is modeled as 60% of the part's
    * retail price — kept EXACT by integer arithmetic: cost_cents =
    * (retail_cents · qty · 3) div 5, floor division on nonnegative
    * operands, so both engines compute the identical long. The name
    * filter collapses part to a sliver that broadcasts, pruning the
    * fact join before the orders join; supplier/nation broadcast too, so
    * the only shuffle is lineitem⋈orders on the order key.
    */
  def q9ProductProfit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      nameToken: String = "red"): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"), round(col("p_retailprice") * 100)
          .cast("long").as("retail_cents"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"),
        (round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long") -
          expr("retail_cents * CAST(round(l_quantity) AS BIGINT) * 3 div 5"))
          .as("amount_cents"))
      .groupBy("nation", "o_year")
      .agg(sum(col("amount_cents")).as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q10 shape ("returned item reporting"): top-k customers by
    * revenue lost to returns in one quarter. Both fact filters (return
    * flag on lineitem, quarter on orders) push to their scans BEFORE the
    * key shuffle — at 100 TB the R-flag filter alone drops ~75% of
    * lineitem at the parquet row-group level. customer joins on the
    * shuffled key (large dim), nation broadcasts, and the top-k is
    * TakeOrderedAndProject — no global sort of the aggregate.
    */
  def q10ReturnedItems(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      qStart: String = "1996-07-01", qEnd: String = "1996-10-01",
      k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.filter(
        col("o_orderdate").cast("date") >= lit(qStart).cast("date") &&
          col("o_orderdate").cast("date") < lit(qEnd).cast("date"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q12 shape ("shipping modes and order priority"): two
    * conditional counts per class over a year of shipments — the fixture
    * has no ship mode, so lines group by return flag instead. The
    * priority split is `sum(when)` riding one partial aggregate (no
    * second pass, no join back); the only shuffle after the fact-fact
    * join is the 3-row final aggregate.
    */
  def q12PriorityByFlag(lineitem: DataFrame, orders: DataFrame,
      yr: Int = 1997): DataFrame =
    lineitem
      .filter(year(col("l_shipdate")) === yr)
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")

  /** TPC-H Q13 shape ("customer distribution"): histogram of per-customer
    * order counts INCLUDING zero-order customers — the left-outer join
    * whose filter must live in the ON clause (a WHERE would turn it
    * inner and drop the zero bucket, the most interesting row). Two
    * cascaded aggregates: per-customer count (shuffle on c_custkey),
    * then the tiny count-of-counts. `count(o_orderkey)` counts matches
    * only — NULLs from unmatched customers fall out for free.
    */
  def q13CustomerDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "5-LOW"): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_orderpriority") =!= excludePriority),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q14 shape ("promotion effect"): promo revenue share of one
    * month's shipments as integer permille. One broadcast dim join, one
    * single-row aggregate; the share is sum(when)/sum on the SAME
    * partial aggregate, then a floor division — no FP ratio.
    */
  def q14PromoShare(lineitem: DataFrame, part: DataFrame,
      mStart: String = "1997-03-01", mEnd: String = "1997-04-01"): DataFrame =
    lineitem
      .filter(col("l_shipdate").cast("date") >= lit(mStart).cast("date") &&
        col("l_shipdate").cast("date") < lit(mEnd).cast("date"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .select((col("p_type") === "PROMO").as("is_promo"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .agg(sum(when(col("is_promo"), col("cents")).otherwise(0L))
        .as("promo_cents"),
        sum(col("cents")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        expr("promo_cents * 1000 div total_cents").as("promo_permille"))

  /** TPC-H Q16 shape ("parts/supplier relationship"): distinct-supplier
    * counts per (brand, type, size) bucket over an approved part subset,
    * excluding a supplier denylist. The fixture has no partsupp — the
    * observed DISTINCT (l_partkey, l_suppkey) pairs from lineitem are
    * the relationship table (dedup BEFORE any dim join: the pair set is
    * ~10× smaller than the fact). The denylist (negative balance — the
    * complaints analog) is a BROADCAST ANTI join, the NOT-IN form that
    * stays correct and shuffle-free at any fact size; part's filters
    * broadcast. count(DISTINCT) plans as the two-level expand aggregate.
    */
  def q16SupplierCount(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, excludeBrand: String = "Brand#1",
      sizes: Seq[Int] = Seq(1, 3, 9, 14, 19, 23, 36, 45)): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(part
        .filter(col("p_brand") =!= excludeBrand &&
          col("p_size").isin(sizes.map(Int.box): _*))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  /** TPC-H Q19 shape ("discounted revenue"): revenue under a DISJUNCTION
    * of brand × size × quantity branches — the query that tests whether
    * OR-of-ANDs predicates still prune. The part-side terms (brand,
    * size) evaluate on the broadcast dim; the lineitem-side quantity
    * terms are written as a disjunction REFERENCING ONLY lineitem
    * columns pre-join where possible (qty ≤ the loosest bound) so the
    * scan prunes rows no branch can accept, then the exact branch
    * predicate runs post-join. One broadcast join, one single-row
    * aggregate, zero shuffles of the fact beyond the scan.
    */
  def q19DisjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qty = round(col("l_quantity")).cast("long")
    val branch1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && qty.between(1L, 11L)
    val branch2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && qty.between(10L, 20L)
    val branch3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 15) && qty.between(20L, 30L)
    lineitem
      // loosest-bound prefilter: no branch accepts qty outside [1, 30].
      // Written on the RAW double (superset range [0.5, 30.5]) — a bound
      // on round(qty) is scan-opaque, but a plain column range reaches
      // the parquet row-group min-max stats; the exact rounded-integer
      // branch predicates then run post-join on the surviving sliver
      .filter(col("l_quantity").between(0.5, 30.5))
      .join(broadcast(part.filter(col("p_size").between(1, 15) &&
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q2 shape ("minimum cost supplier"): for each part of one
    * size/type, every region supplier matching the part's MINIMUM
    * supply metric — the correlated-scalar-MIN query. The fixture's
    * relationship table is the distinct (part, supplier) pairs observed
    * in lineitem; the metric is the supplier balance in cents. The
    * correlated form re-aggregates per outer row; this is the
    * decorrelated plan written directly — candidates narrowed by ALL
    * dim filters first (region suppliers broadcast, filtered part
    * sliver broadcast), then ONE window-min per part and an equality
    * filter, so the per-part minimum costs one exchange over the
    * already-tiny candidate set and ties surface per the spec.
    */
  def q2MinCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "EUROPE", size: Int = 15,
      pType: String = "STANDARD"): DataFrame = {
    val supRegion = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal") * 100).cast("long").as("bal_cents"))
    val cand = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(part.filter(col("p_size") === size &&
        col("p_type") === pType)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
    cand
      .withColumn("min_cents",
        min(col("bal_cents")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("bal_cents") === col("min_cents"))
      .select(col("p_partkey"), col("p_type"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("bal_cents"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** TPC-H Q11 shape ("important stock identification"): per-part
    * inventory value restricted to one nation's suppliers, keeping the
    * parts whose value exceeds a fixed FRACTION OF THE GRAND TOTAL —
    * the group-by + scalar-subquery-HAVING query. The fixture has no
    * partsupp, so value is shipped-quantity × retail price in integer
    * cents. The scalar total is a one-row aggregate broadcast-crossed
    * into the per-part rows (the subquery decorrelated by hand);
    * supplier's nation filter broadcasts and prunes BEFORE the part
    * aggregate, so the heavy groupBy only sees one nation's lines.
    */
  def q11ImportantStock(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nationKey: Int = 7,
      fractionDen: Long = 1000L): DataFrame = {
    val value = lineitem
      .join(broadcast(supplier.filter(col("s_nationkey") === nationKey)
        .select(col("s_suppkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey")
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT) * retail_cents"))
        .as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value.crossJoin(broadcast(total))
      .filter(col("value_cents") * fractionDen > col("total_cents"))
      .select(col("p_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("p_partkey"))
  }

  /** TPC-H Q20 shape ("potential part promotion"): suppliers who were
    * the DOMINANT shipper of some name-matched part in one year (their
    * quantity exceeds half the part's total — the availqty > ½·ordered
    * analog on observed shipments). The nested-IN chain becomes: per
    * (supplier, part) aggregate → per-part total as a KEYED window (no
    * second aggregate or join-back) → dominance filter → LEFT SEMI into
    * supplier. Every step is keyed on part or supplier — nothing
    * corpus-wide. The name-matched part sliver broadcasts; the year
    * filter pushes to the scan.
    */
  def q20PromoSuppliers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, nameToken: String = "red",
      yr: Int = 1997): DataFrame = {
    val perPair = lineitem
      .filter(year(col("l_shipdate")) === yr)
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
    val dominant = perPair
      .withColumn("part_total",
        sum(col("qty")).over(Window.partitionBy("l_partkey")))
      .filter(col("qty") * 2 > col("part_total"))
      .select(col("l_suppkey"))
    supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  /** NULL-SAFE full-outer join (`<=>` / IS NOT DISTINCT FROM): the join
    * form where NULL is a MATCHABLE key value — here the "unattributed"
    * cohort (`nullif(user_id % 10, 7)` models the tracking-consent /
    * missing-attribution bucket every marketing rollup has). A plain
    * equi full-outer leaves TWO dangling null-key rows (NULL never
    * equals NULL); the null-safe join pairs them into one reconciled
    * row — the difference the spec pins by row count.
    *
    * Scale note: null-safe equality hashes NULL like any other key, so
    * the whole unattributed population lands on ONE reducer — the
    * canonical skew key when attribution coverage is low. The safe
    * pattern (used here) is to pre-aggregate both sides to cohort grain
    * BEFORE the join, so the null bucket carries one row per side no
    * matter how many raw events are unattributed; joining raw facts
    * null-safely is the anti-pattern.
    */
  def nullSafeCohortJoin(events: DataFrame): DataFrame = {
    def cohort = expr("nullif(user_id % 10, 7)")
    val purchases = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(cohort.as("cohort"))
      .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
    val clicks = events
      .filter(col("event_type") === "click")
      .groupBy(cohort.as("c_cohort"))
      .agg(count(lit(1)).as("n_clicks"))
    purchases
      .join(clicks, purchases("cohort") <=> clicks("c_cohort"), "full_outer")
      .select(coalesce(col("cohort"), col("c_cohort")).as("cohort"),
        col("purchase_cents"), col("n_clicks"))
      .orderBy(asc_nulls_first("cohort"))
  }
}
