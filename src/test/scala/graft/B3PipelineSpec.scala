package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.B3Pipeline

/** Golden pipeline test: a miniature stock-shaped series through the full
  * flagship transform, asserting the reference's lag/variation/aggregate
  * semantics row-by-row (FIXTURES.md golden-input spec).
  */
class B3PipelineSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  /** 2 "tickers" × 40 consecutive days, deterministic prices, plus null
    * rows that the P5 filter must drop.
    */
  private def golden = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val rows = for {
      u <- Seq(1L, 2L)
      d <- 0 until 40
    } yield Row(u * 1000 + d, new java.sql.Timestamp(base + d * 86400000L),
      u, 100.0 + u * 10 + d)
    val withNulls = rows ++ Seq(
      Row(9998L, null, 1L, 50.0),
      Row(9999L, new java.sql.Timestamp(base), 1L, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(withNulls, 2), schema)
  }

  test("null filter drops exactly the null rows") {
    assert(B3Pipeline.filterNulls(golden).count() === 80)
  }

  test("lag(7)/lag(30) are null for the first 7/30 rows per ticker, then exact") {
    val v = B3Pipeline.withVariations(B3Pipeline.prepare(golden))
      .orderBy("user_id", "event_id")
      .collect()
    val user1 = v.filter(_.getAs[Long]("user_id") == 1L)
    assert(user1.take(7).forall(_.isNullAt(user1.head.fieldIndex("preco_7d_atras"))))
    assert(user1.take(30).forall(_.isNullAt(user1.head.fieldIndex("preco_30d_atras"))))
    // row 7 (0-based): price 117, price 7 rows back = 110
    val r7 = user1(7)
    assert(r7.getAs[Double]("preco_fechamento") === 117.0)
    assert(r7.getAs[Double]("preco_7d_atras") === 110.0)
    // variation = round((117-110)/110*100, 2)
    assert(r7.getAs[Double]("variacao_7d") ===
      BigDecimal((117.0 - 110.0) / 110.0 * 100).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val r30 = user1(30)
    assert(r30.getAs[Double]("preco_30d_atras") === 110.0)
  }

  test("summary aggregates per (user, year, month) with reference shape") {
    val s = B3Pipeline.flagship(golden).collect()
    // 2 users × 2 months (Jan 31 days, Feb 9 days)
    assert(s.length === 4)
    val jan1 = s.find(r => r.getAs[Long]("user_id") == 1L && r.getAs[Int]("month") == 1).get
    assert(jan1.getAs[Long]("total_registros") === 31)
    assert(jan1.getAs[Double]("menor_preco") === 110.0)
    assert(jan1.getAs[Double]("maior_preco") === 140.0)
    // avg of 110..140 = 125
    assert(jan1.getAs[Double]("media_preco") === 125.0)
  }

  test("flagship plan: single WindowExec for both lags, filters pushed to scan") {
    val plan = B3Pipeline.flagship(Tables.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(plan).size === 1,
      s"both lag columns must share one WindowExec:\n$plan")
    val scan = B3Pipeline.filterNulls(Tables.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull("),
      s"null filters must reach the parquet scan:\n$scan")
  }
}
