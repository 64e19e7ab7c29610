package graft

import org.apache.spark.sql.functions._

/** The fixture self-check that round 7 lacked: when the driver regenerates a
  * fixture with a different schema, `Tables.schemaReport` must say so loudly
  * — naming the table and the ACTUAL loaded types — instead of letting 23
  * queries die downstream with opaque analysis errors.
  */
class TablesContractSpec extends SparkTestBase {
  import spark.implicits._

  test("schemaReport is empty on the real fixtures") {
    assert(Tables.schemaReport(spark, sf0001) === Nil)
    assert(Tables.schemaReport(spark, sf001) === Nil)
  }

  test("synthetic schema drift is reported with the actual loaded schema") {
    // Copy the sf0.001 fixture dir, then overwrite `events` with a drifted
    // schema (ts renamed + retyped) — the exact class of failure from the
    // round-7 regeneration.
    val dir = tmpDir("graft-drift")
    for (t <- Tables.expectedColumns.keys)
      spark.read.parquet(s"$sf0001/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .withColumnRenamed("ts", "event_time")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val report = Tables.schemaReport(spark, dir)
    assert(report.size === 1, report)
    assert(report.head.startsWith("events:"), report.head)
    assert(report.head.contains("event_time:string"),
      s"report must show the ACTUAL drifted schema: ${report.head}")
    val e = intercept[IllegalStateException] {
      Tables.assertFixtureContract(spark, dir)
    }
    assert(e.getMessage.contains("events:"))
  }

  test("events loader adapts to all three historical ts encodings") {
    // TimestampNTZ (the current µs fixture) — loaded via the real file.
    val viaNtz = Tables.events(spark, sf0001)
    assert(viaNtz.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val realCount = viaNtz.count()
    assert(realCount > 0)

    // TimestampType (isAdjustedToUTC fixture): written by Spark itself.
    val dir = tmpDir("graft-ts-variants")
    viaNtz.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaTs = Tables.events(spark, dir)
    assert(viaTs.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(viaTs.count() === realCount)

    // LongType (the legacy nanos fixture under nanosAsLong): simulate by
    // writing ts as epoch-nanos BIGINT named ts — the loader must
    // floor-convert to the identical instants.
    val dirNs = tmpDir("graft-ts-nanos")
    viaNtz
      .withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$dirNs/events.parquet")
    val viaNs = Tables.events(spark, dirNs)
    assert(viaNs.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // same instants, row for row
    val a = viaNtz.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    val b = viaNs.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(a === b)

    // an unrecognized type fails loudly, naming the type
    val dirBad = tmpDir("graft-ts-bad")
    viaNtz.withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dirBad/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dirBad) }
    assert(e.getMessage.contains("StringType"), e.getMessage)
  }
}
