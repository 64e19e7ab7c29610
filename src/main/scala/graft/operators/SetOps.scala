package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-operation inventory (SURVEY.md §2.6, U1) + intersect/except parity.
  *
  * Reference: union-by-name of homogeneous per-ticker frames
  * (`/root/reference/src/glue/b3_collector.py:72`, `pd.concat`).
  * Union is a zero-shuffle concatenation of partitions; intersect/except
  * are distinct-based and shuffle on the full row — fine for key columns,
  * avoid on wide rows at 100 TB.
  */
object SetOps {

  /** U1: split a table, permute one side's column order, unionByName —
    * result must equal the original regardless of column order.
    */
  def unionByNameRoundTrip(orders: DataFrame): DataFrame = {
    val open   = orders.filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val others = orders.filter(col("o_orderstatus") =!= "O")
      .select("o_totalprice", "o_orderstatus", "o_custkey", "o_orderkey")
    open.unionByName(others).orderBy("o_orderkey")
  }

  /** Schema-DRIFT union: two generations of a feed that no longer share
    * every column, combined with `allowMissingColumns` — each side's
    * missing columns come back NULL (the long-lived-pipeline reality
    * `unionByName` alone rejects). Total order: (key, status) is unique
    * here — per key at most one row from each branch, distinguished by
    * the status column's nullness — with null placement pinned explicitly
    * (engines disagree on default NULL ordering).
    */
  def unionMissingColumns(orders: DataFrame): DataFrame = {
    val gen1 = orders.select(col("o_orderkey"), col("o_orderstatus"))
    val gen2 = orders.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"))
    gen1.unionByName(gen2, allowMissingColumns = true)
      .orderBy(col("o_orderkey"), col("o_orderstatus").asc_nulls_first)
  }

  /** EXCEPT parity: customer keys with no order. */
  def exceptKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("key"))
      .except(orders.select(col("o_custkey").as("key")))
      .orderBy("key")

  /** INTERSECT parity: customer keys that did order. */
  def intersectKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("key"))
      .intersect(orders.select(col("o_custkey").as("key")))
      .orderBy("key")

  /** EXCEPT ALL parity (bag semantics): each row survives with
    * multiplicity max(0, count_left − count_right) — the count
    * DIFFERENCE, where the set form answers only membership. The plan is
    * a replicate-by-count aggregate, not a row-by-row anti join: shuffle
    * state is ∝ distinct keys. Demo: 1996's order-priority mix minus
    * 1997's — what the set EXCEPT would always report as empty.
    */
  def exceptAllPriorities(orders: DataFrame): DataFrame =
    orders.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_orderpriority"))
      .exceptAll(orders.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderpriority")))
      .orderBy("o_orderpriority")

  /** INTERSECT ALL parity: multiplicity min(count_left, count_right). */
  def intersectAllPriorities(orders: DataFrame): DataFrame =
    orders.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_orderpriority"))
      .intersectAll(orders.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderpriority")))
      .orderBy("o_orderpriority")

  /** Bag-semantics SYMMETRIC DIFFERENCE — completes the u-family set
    * algebra (u5/u6 give EXCEPT ALL / INTERSECT ALL): each key survives
    * with multiplicity |count_a − count_b|, reported with the side
    * holding the surplus. Computed as ONE scan + ONE keyed aggregate
    * (a sum(when) per side; shuffle state ∝ distinct keys), where the
    * textbook a.exceptAll(b) ∪ b.exceptAll(a) form scans and shuffles
    * the same input twice; the multiplicity ships as a COUNT rather
    * than replicated rows, so no operator materializes a surplus-sized
    * array for a hot key. The oracle runs the two-EXCEPT-ALL
    * formulation and re-aggregates it — an independent derivation, so
    * the hash gate proves the count-difference identity rather than
    * the query agreeing with itself.
    */
  def symmetricDiffPriorities(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_1996"),
        sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("n_1997"))
      .filter(col("n_1996") =!= col("n_1997"))
      .select(
        col("o_orderpriority"),
        when(col("n_1996") > col("n_1997"), "1996").otherwise("1997")
          .as("surplus_side"),
        abs(col("n_1996") - col("n_1997")).as("multiplicity"))
      .orderBy("o_orderpriority")

  /** O3/O4 analog: deterministic top-k (sort + limit → TakeOrderedAndProject). */
  def topK(orders: DataFrame, k: Int): DataFrame =
    orders
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** 2-D SKYLINE (Pareto front): parts no other part dominates —
    * cheaper-or-equal AND bigger-or-equal with at least one strict
    * (minimize price, maximize size). The multi-objective "best
    * candidates" cut that a top-k on any single weighted score cannot
    * express.
    *
    * Two-level plan, NOT the textbook NOT-EXISTS self-join (which is a
    * quadratic non-equi nested loop — a plan-time error here under
    * CartesianGuard):
    *
    *  1. PRE-PRUNE on a coarse price grid: per bucket ⌊cents/W⌋, the max
    *     size; a running max over STRICTLY LOWER buckets (window over the
    *     tiny bucket aggregate — metadata-scale rows) dominates — with a
    *     guaranteed strictly-lower price, since bucket ranges are
    *     disjoint — every row whose size it reaches. One broadcast join
    *     back eliminates the bulk of the input before any global step;
    *     survivors ≈ the skyline's neighborhood, not the table.
    *  2. EXACT PASS on the survivors: sorted by price, a row survives iff
    *     its size strictly exceeds the running max size over all
    *     strictly-cheaper rows (RANGE frame excludes price ties) AND no
    *     same-price row strictly out-sizes it. Equal (price, size)
    *     duplicates dominate nothing and both survive, matching the
    *     NOT-EXISTS oracle exactly.
    *
    * The global window runs single-partition — over the pruned remnant
    * only, the same shape as [[Aggregates]]' bucket-refined percentiles
    * (dq4): stage 1 is the scale story, stage 2 is exactness over a
    * provably small set.
    */
  def skyline2d(part: DataFrame, bucketCents: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = part.select(col("p_partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"),
      col("p_size").cast("long").as("size"))
      .withColumn("bucket", expr(s"cents div ${bucketCents}L"))
    // per-bucket max size, then the best size among strictly lower buckets
    val byBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = p.groupBy("bucket").agg(max(col("size")).as("bmax"))
      .withColumn("lower_max", max(col("bmax")).over(byBucket))
      .select(col("bucket"), col("lower_max"))
    val pruned = p.join(broadcast(bucketMax), "bucket")
      .filter(col("lower_max").isNull || col("size") > col("lower_max"))
    // exact pass: strictly-cheaper running max (RANGE excludes ties) +
    // same-price strict out-size check
    val byPrice = Window.orderBy("cents")
      .rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy("cents")
    pruned
      .withColumn("cheaper_max", max(col("size")).over(byPrice))
      .withColumn("same_price_max", max(col("size")).over(samePrice))
      .filter((col("cheaper_max").isNull || col("size") > col("cheaper_max")) &&
        col("size") === col("same_price_max"))
      .select(col("p_partkey"), col("cents"), col("size"))
      .orderBy("p_partkey")
  }
}
