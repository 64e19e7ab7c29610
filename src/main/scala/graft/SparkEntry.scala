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
    "b3_flagship_summary" -> ((s, dir) => B3Pipeline.flagship(Tables.events(s, dir))),
    "b3_variations" -> ((s, dir) => B3Pipeline.variationsFrame(Tables.events(s, dir))),
    "b3_stats" -> ((s, dir) => B3Pipeline.stats(B3Pipeline.withVariations(B3Pipeline.prepare(Tables.events(s, dir))))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "b3_flagship_summary" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id,
        |         CAST(ts AS DATE) AS date,
        |         EXTRACT(year FROM CAST(ts AS DATE)) AS year,
        |         EXTRACT(month FROM CAST(ts AS DATE)) AS month,
        |         value AS preco_fechamento, event_id AS volume_negociado
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(preco_fechamento, 7)  OVER (PARTITION BY user_id ORDER BY event_id) AS preco_7d_atras,
        |         LAG(preco_fechamento, 30) OVER (PARTITION BY user_id ORDER BY event_id) AS preco_30d_atras
        |  FROM prepared
        |), vv AS (
        |  SELECT *,
        |         CASE WHEN preco_7d_atras IS NOT NULL
        |              THEN ROUND((preco_fechamento - preco_7d_atras) / preco_7d_atras * 100, 2) END AS variacao_7d,
        |         CASE WHEN preco_30d_atras IS NOT NULL
        |              THEN ROUND((preco_fechamento - preco_30d_atras) / preco_30d_atras * 100, 2) END AS variacao_30d
        |  FROM v
        |)
        |SELECT user_id, CAST(year AS INT) AS year, CAST(month AS INT) AS month,
        |       COUNT(*) AS total_registros,
        |       CAST(SUM(volume_negociado) AS BIGINT) AS volume_total,
        |       ROUND(AVG(preco_fechamento), 2) AS media_preco,
        |       ROUND(MIN(preco_fechamento), 2) AS menor_preco,
        |       ROUND(MAX(preco_fechamento), 2) AS maior_preco,
        |       ROUND(AVG(variacao_7d), 2) AS media_variacao_7d,
        |       ROUND(AVG(variacao_30d), 2) AS media_variacao_30d
        |FROM vv GROUP BY user_id, year, month
        |ORDER BY user_id, year, month""".stripMargin,
    "b3_variations" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id,
        |         CAST(ts AS DATE) AS date,
        |         CAST(EXTRACT(year FROM CAST(ts AS DATE)) AS INT) AS year,
        |         CAST(EXTRACT(month FROM CAST(ts AS DATE)) AS INT) AS month,
        |         value AS preco_fechamento, event_id AS volume_negociado
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(preco_fechamento, 7)  OVER (PARTITION BY user_id ORDER BY event_id) AS preco_7d_atras,
        |         LAG(preco_fechamento, 30) OVER (PARTITION BY user_id ORDER BY event_id) AS preco_30d_atras
        |  FROM prepared
        |)
        |SELECT event_id, user_id, date, year, month, preco_fechamento, volume_negociado,
        |       preco_7d_atras, preco_30d_atras,
        |       CASE WHEN preco_7d_atras IS NOT NULL
        |            THEN ROUND((preco_fechamento - preco_7d_atras) / preco_7d_atras * 100, 2) END AS variacao_7d,
        |       CASE WHEN preco_30d_atras IS NOT NULL
        |            THEN ROUND((preco_fechamento - preco_30d_atras) / preco_30d_atras * 100, 2) END AS variacao_30d
        |FROM v ORDER BY event_id""".stripMargin,
    "b3_stats" ->
      """WITH prepared AS (
        |  SELECT event_id, user_id, value AS preco_fechamento
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |), v AS (
        |  SELECT *,
        |         LAG(preco_fechamento, 7)  OVER (PARTITION BY user_id ORDER BY event_id) AS preco_7d_atras,
        |         LAG(preco_fechamento, 30) OVER (PARTITION BY user_id ORDER BY event_id) AS preco_30d_atras
        |  FROM prepared
        |), vv AS (
        |  SELECT *,
        |         CASE WHEN preco_7d_atras IS NOT NULL
        |              THEN ROUND((preco_fechamento - preco_7d_atras) / preco_7d_atras * 100, 2) END AS variacao_7d,
        |         CASE WHEN preco_30d_atras IS NOT NULL
        |              THEN ROUND((preco_fechamento - preco_30d_atras) / preco_30d_atras * 100, 2) END AS variacao_30d
        |  FROM v
        |)
        |SELECT user_id, COUNT(*) AS total_registros,
        |       ROUND(AVG(preco_fechamento), 2) AS media_preco,
        |       ROUND(AVG(variacao_7d), 2) AS media_variacao_7d,
        |       ROUND(AVG(variacao_30d), 2) AS media_variacao_30d
        |FROM vv GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
