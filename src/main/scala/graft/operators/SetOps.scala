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

  /** O3/O4 analog: deterministic top-k (sort + limit → TakeOrderedAndProject). */
  def topK(orders: DataFrame, k: Int): DataFrame =
    orders
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
}
