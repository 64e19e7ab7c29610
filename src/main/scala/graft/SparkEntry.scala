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

  /** One entry per implemented operator from SURVEY.md §2 — merged from
    * the per-tier registries under graft.registry (split in round 9 so
    * a query, its oracle, and nothing else share a file; names are
    * globally unique, enforced by PlanHygieneSpec + RegistrySpec).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.RegistryAggregates.queries ++
    registry.RegistryCore.queries ++
    registry.RegistryDedup.queries ++
    registry.RegistryEvents.queries ++
    registry.RegistryJoins.queries ++
    registry.RegistryQuality.queries ++
    registry.RegistrySimGraph.queries ++
    registry.RegistryText.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — merged from the same per-tier registries,
    * so a query and its oracle always live side by side.
    */
  def oracleSql: Map[String, String] =
    registry.RegistryAggregates.oracleSql ++
    registry.RegistryCore.oracleSql ++
    registry.RegistryDedup.oracleSql ++
    registry.RegistryEvents.oracleSql ++
    registry.RegistryJoins.oracleSql ++
    registry.RegistryQuality.oracleSql ++
    registry.RegistrySimGraph.oracleSql ++
    registry.RegistryText.oracleSql

  /** WIDE-gate scale referees (dev tooling, not driver-read): tractable
    * DuckDB reformulations for the queries whose PRIMARY oracle is
    * intentionally quadratic and times out on ScaleGen data (sf>=1).
    * Dumped by [[Verify]] as scale_referee.json; consumed only by
    * tools/scalecheck.py — the driver's sf0.01 gate and tools/check.py
    * always use [[oracleSql]]. See RegistryDedup.scaleOracleSql for the
    * per-query derivations and exactness arguments. */
  def scaleOracleSql: Map[String, String] =
    registry.RegistryDedup.scaleOracleSql ++
    registry.RegistrySimGraph.scaleOracleSql

  /** Optional spark-side slice selector per scale referee (SQL over view
    * `spark_result`, the query's own verify-output parquet) for referees
    * that compare a deterministic pair-local subset rather than the full
    * result. Keys are a subset of [[scaleOracleSql]] (RegistrySpec). */
  def scaleSparkSql: Map[String, String] =
    registry.RegistryDedup.scaleSparkSql ++
    registry.RegistrySimGraph.scaleSparkSql
}
