package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access layer.
  *
  * All queries in [[SparkEntry.queries]] receive an `sfDir` (e.g.
  * `/root/testdata/sf0.01`) and read the driver-generated parquet tables
  * through these helpers, so scan options live in exactly one place.
  *
  * Scale note: at 100 TB these reads become multi-file partitioned scans;
  * everything downstream is written so Catalyst can push filters and prune
  * columns into the scan (verified via `.explain` in the test suite).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) (FIXTURES.md), which Spark 4
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). We read it as raw
    * nanos (legacy conf) and floor-convert to a microsecond timestamp with
    * integer division — `ts div 1000`, NOT `/ 1000.0`: epoch-nanos ≈ 1.7e18
    * exceeds double's 2^53 integer range, so float division would corrupt
    * timestamps. DuckDB's `CAST(ts AS TIMESTAMP)` floors the same way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
