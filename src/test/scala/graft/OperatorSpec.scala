package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Unit semantics for the relational battery on crafted inputs (the
  * fixture-level behavior is oracle-checked; these pin the edge cases the
  * sf0.01 data can't exercise).
  */
class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  test("unionByName is column-order independent") {
    val a = Seq((1L, "x", 10.0)).toDF("k", "s", "v")
    val b = Seq((20.0, "y", 2L)).toDF("v", "s", "k")
    val u = a.unionByName(b.select("k", "s", "v")).orderBy("k")
    assert(u.columns.toSeq === Seq("k", "s", "v"))
    assert(u.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("anti join keeps exactly the unmatched left rows") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ords = Seq((10L, 1L)).toDF("o_orderkey", "o_custkey")
    val r = JoinOps.antiJoin(cust, ords).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("semi join emits each matching left row once") {
    val ords = Seq((1L, 5.0), (2L, 6.0)).toDF("o_orderkey", "o_totalprice")
    val li = Seq((1L, 50.0), (1L, 60.0), (3L, 50.0))
      .toDF("l_orderkey", "l_quantity")
    val r = JoinOps.semiJoin(ords, li).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("except/intersect on crafted keys") {
    val c = Seq(1L, 2L, 3L).toDF("c_custkey").withColumn("c_name", lit("n"))
    val o = Seq(2L).toDF("o_custkey")
    assert(SetOps.exceptKeys(c, o).collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(SetOps.intersectKeys(c, o).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("guarded rename falls back only when date is absent") {
    val noDate = Seq((1L, "t")).toDF("o_orderkey", "o_orderdate")
    assert(ColumnOps.guardedRename(noDate).columns.contains("date"))
    val hasDate = Seq((1L, "keep", "x")).toDF("o_orderkey", "date", "o_orderdate")
    // date already present → o_orderdate must NOT be renamed over it
    val out = ColumnOps.guardedRename(hasDate).collect()
    assert(out.head.getString(1) === "keep")
  }

  test("broadcast dim join plans a BroadcastHashJoin") {
    val plan = JoinOps.broadcastDim(Tables.nation(spark, sf0001),
      Tables.region(spark, sf0001)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("star join broadcasts all three dims") {
    val plan = JoinOps.starJoin(Tables.lineitem(spark, sf0001),
      Tables.orders(spark, sf0001), Tables.customer(spark, sf0001),
      Tables.nation(spark, sf0001), Tables.region(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("top-k plans TakeOrderedAndProject (no global sort materialization)") {
    val plan = SetOps.topK(Tables.orders(spark, sf0001), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("projection prunes the parquet read schema") {
    val plan = ColumnOps.projection(Tables.part(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("p_type"), s"unused column must be pruned:\n$plan")
  }

  test("approx distinct is within rsd of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = Aggregates.distinctCount(li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Aggregates.approxDistinct(li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k: $n vs ${approx(k)}")
    }
  }
}
