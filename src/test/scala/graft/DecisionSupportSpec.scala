package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, JoinOps, Quality}

/** Semantics + plan-shape pins for the round-8 TPC-H decision-support
  * additions (Q2/Q4/Q6/Q7/Q9/Q10/Q12/Q13/Q14/Q16/Q19 adaptations).
  * The DuckDB oracle is the value gate; these tests pin the SCALE
  * properties the oracle can't see — which side broadcasts, what
  * reaches the scan, whether the zero bucket survives the outer join.
  */
class DecisionSupportSpec extends SparkTestBase {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q4: EXISTS plans as a semi join, not a join+distinct") {
    val p = plan(JoinOps.q4OrderPriority(Tables.orders(spark, sf0001),
      Tables.lineitem(spark, sf0001)))
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
    assert(!p.contains("Distinct"), s"semi join must not deduplicate:\n$p")
  }

  test("q13: zero-order customers survive; ON-clause filter stays outer") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L, "1-URGENT"), (11L, 1L, "5-LOW"),
        (12L, 2L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    // cust 1: one kept order; cust 2: only excluded orders -> zero
    // bucket; cust 3: no orders at all -> zero bucket
    val got = JoinOps.q13CustomerDistribution(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 2L), (1L, 1L)))
  }

  test("q19: the loosest quantity bound reaches the lineitem scan") {
    val df = JoinOps.q19DisjunctiveRevenue(Tables.lineitem(spark, sf0001),
      Tables.part(spark, sf0001))
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    // the loosest-bound qty range is written on the raw column exactly
    // so it reaches the parquet scan; the part side's brand/size
    // filters must be pushed on the dim scan
    assert(scans.contains("GreaterThanOrEqual(l_quantity,0.5)"),
      s"expected raw quantity range pushed:\n$scans")
    assert(scans.contains("In(p_brand") || scans.contains("p_brand"),
      s"expected brand filter pushed on part scan:\n$scans")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
  }

  test("q2: ties at the per-part minimum all surface") {
    val lineitem = Seq((1L, 100L, 1L), (1L, 101L, 1L), (1L, 102L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .withColumn("l_suppkey", expr("l_partkey - 99"))
      .select(col("l_orderkey"), lit(100L).as("l_partkey"), col("l_suppkey"))
    val li = Seq((100L, 1L), (100L, 2L), (100L, 3L))
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((100L, "STANDARD", 15)).toDF("p_partkey", "p_type", "p_size")
    val supplier = Seq((1L, "s1", 0L, 5.00), (2L, "s2", 0L, 5.00),
        (3L, "s3", 0L, 9.00))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation = Seq((0L, "NATION_0", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0L, "EUROPE")).toDF("r_regionkey", "r_name")
    val got = JoinOps.q2MinCostSupplier(li, part, supplier, nation, region)
      .collect().map(r => (r.getLong(2), r.getLong(5)))
    assert(got.toSeq === Seq((1L, 500L), (2L, 500L)))
  }

  test("q14/q6: permille and conditional sums are integer-exact") {
    val li = Seq(
      (1L, 100L, 10.0, 100.00, 0.0, "1997-03-05"),
      (2L, 101L, 10.0, 300.00, 0.0, "1997-03-06"),
      (3L, 100L, 10.0, 999.00, 0.0, "1997-06-01")) // outside the month
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val part = Seq((100L, "PROMO"), (101L, "STANDARD"))
      .toDF("p_partkey", "p_type")
    val got = JoinOps.q14PromoShare(li, part).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((10000L, 40000L, 250L)))

    val li6 = Seq((1L, 10.0, 100.00, 0.05, "1997-02-01"),
        (2L, 30.0, 100.00, 0.05, "1997-02-01"), // qty >= 24: out
        (3L, 10.0, 100.00, 0.02, "1997-02-01")) // discount below band: out
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val got6 = Aggregates.q6ForecastRevenue(li6).head()
    assert((got6.getLong(0), got6.getLong(1)) === ((500L, 1L)))
  }

  test("q16: denylisted suppliers are excluded via broadcast anti join") {
    val df = JoinOps.q16SupplierCount(Tables.lineitem(spark, sf0001),
      Tables.part(spark, sf0001), Tables.supplier(spark, sf0001))
    val p = plan(df)
    assert(p.contains("LeftAnti"), s"expected LeftAnti in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"denylist must broadcast:\n$p")
  }

  test("q20: dominance is per part, not global; semi join dedups suppliers") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("1997-06-01 00:00:00")
    // part 1: supp 10 ships 30 of 40 (dominant); part 2: 50/50 split —
    // neither dominates (strict >). supp 10 also dominates part 3, but
    // must appear ONCE.
    val li = Seq((1L, 1L, 10L, 30.0, ts), (2L, 1L, 11L, 10.0, ts),
        (3L, 2L, 10L, 5.0, ts), (4L, 2L, 11L, 5.0, ts),
        (5L, 3L, 10L, 9.0, ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val part = Seq((1L, "red bolt"), (2L, "red nut"), (3L, "red gear"))
      .toDF("p_partkey", "p_name")
    val supplier = Seq((10L, "s10", 0L), (11L, "s11", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "NATION_0")).toDF("n_nationkey", "n_name")
    val got = JoinOps.q20PromoSuppliers(li, part, supplier, nation)
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(10L))
  }

  test("fulfillment latency: histogram-walk percentiles are the exact ranks") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // one priority class, latencies 1..10 days, one line each:
    // p50 -> smallest d with cum >= 5 -> 5; p90 -> 9; p99 -> 10
    val orders = (1L to 10L).map(i => (i, t("1997-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = (1L to 10L).map(i =>
        (i, t(f"1997-01-${1 + i}%02d"))).toDF("l_orderkey", "l_shipdate")
    val got = Quality.fulfillmentLatency(li, orders).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((10L, 5L, 9L, 10L)))
  }

  test("q7: both nation roles broadcast; revenue symmetric in the pair") {
    val df = JoinOps.q7NationVolume(Tables.lineitem(spark, sf0001),
      Tables.orders(spark, sf0001), Tables.customer(spark, sf0001),
      Tables.supplier(spark, sf0001), Tables.nation(spark, sf0001))
    val rows = df.collect()
    // every row is one of the two (supp, cust) orientations
    assert(rows.forall { r =>
      val (s, c) = (r.getString(0), r.getString(1))
      (s == "NATION_3" && c == "NATION_7") ||
        (s == "NATION_7" && c == "NATION_3")
    })
  }
}
