package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, UserEvent, UserRunning}

/** T2 streaming parity: file-source micro-batch over parquet drops with
  * Trigger.AvailableNow, watermarked windowed aggregation, and custom
  * state via mapGroupsWithState — results cross-checked against the
  * equivalent batch computation.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** Stage the sf0.001 events table as a "raw drop" directory. */
  private def stageRawDir(): (String, org.apache.spark.sql.DataFrame) = {
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = tmpDir("rawdrops")
    batch.coalesce(2).write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir))
  }

  test("windowed counts over AvailableNow file stream match batch") {
    val (dir, batch) = stageRawDir()
    val streamed = EventStream.windowedCounts(
      EventStream.readRaw(spark, dir, batch.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "win_counts",
      tmpDir("ckpt"), outputMode = "complete")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    val want = batch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming OHLC bars match the oracle-checked batch query exactly") {
    val (dir, batch) = stageRawDir()
    val streamed = EventStream.ohlcBarsStream(
      EventStream.readRaw(spark, dir, batch.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "ohlc_stream",
      tmpDir("ckpt"), outputMode = "complete")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
    val want = graft.operators.TimeSeries.ohlcBars(batch)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("the oracle-checked exact windowed aggregate is batch/stream identical") {
    val (dir, batch) = stageRawDir()
    // same FUNCTION through the streaming engine (complete mode) and the
    // batch engine — the e10 query oracle-checks the batch side, this
    // test closes the loop to the stream side
    val streamed = EventStream.windowedCountsExact(
      EventStream.readRaw(spark, dir, batch.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "win_exact",
      tmpDir("ckpt"), outputMode = "complete")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = EventStream.windowedCountsExact(batch)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("a finalized window is immutable: stragglers cannot resurrect or re-emit it") {
    val dir = tmpDir("rawlate")
    // UTC-anchored: window(ts, "1 hour") aligns to epoch hours, so the
    // base must be an exact UTC hour or the asserted window starts shift
    // on any JVM whose default timezone has a fractional-hour offset
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
    def batch(rows: (Long, Double)*) = rows.map { case (id, hours) =>
      (id, new java.sql.Timestamp(base + (hours * 3600e3).toLong), 1L, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // four single-file drops, processed oldest-modified first. Each part
    // file is renamed + mtime-stamped so BOTH the name and modification-
    // time orders match the intended arrival order (random part-file
    // uuids otherwise make the listing order arbitrary):
    //   0: hour-5 on-time rows
    //   1: hour-8 row  -> watermark 7:50 finalizes + emits window 5
    //   2: hour-5.3 straggler -> races window 5's eviction
    //   3: hour-11 row -> watermark 10:50 evicts everything still live
    new java.io.File(dir).mkdirs()
    def drop(idx: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = tmpDir(s"stage_late_$idx")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"drop-$idx%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(base + idx * 60000L)
    }
    drop(0, batch((1L, 5.0), (2L, 5.2)))
    drop(1, batch((3L, 8.0)))
    drop(2, batch((4L, 5.3)))
    drop(3, batch((5L, 11.0)))
    val schema = spark.read.parquet(dir).schema
    val streamed = EventStream.windowedCounts(
      EventStream.readRawThrottled(spark, dir, schema, maxFilesPerTrigger = 1))
    val q = streamed.writeStream
      .outputMode("append").format("memory").queryName("late_drop")
      .option("checkpointLocation", tmpDir("ckpt_late"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the four files must have drained as separate micro-batches, in
    // modification-time order - the premise of the scenario
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    // append mode's exactly-once window contract: every window arrives
    // AT MOST ONCE downstream, no matter how stragglers interleave with
    // eviction. (Whether the hour-5.3 straggler is merged or dropped is
    // explicitly NOT guaranteed by Spark - eviction timing decides; both
    // n=2 and n=3 are legal. Duplicate emission of window 5 is the
    // failure mode that would break downstream consumers.)
    val rows = spark.table("late_drop")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toSeq.sorted
    val byWindow = rows.groupBy(_._1)
    assert(byWindow.values.forall(_.size === 1),
      s"every window must be emitted exactly once, got $rows")
    assert(byWindow.keySet === Set(base + 5 * 3600 * 1000L, base + 8 * 3600 * 1000L))
    val h5 = rows.toMap.apply(base + 5 * 3600 * 1000L)
    assert(h5 === 2L || h5 === 3L,
      s"window 5 must hold the on-time rows (straggler merge optional), got $h5")
    assert(rows.toMap.apply(base + 8 * 3600 * 1000L) === 1L)
  }

  test("throttled backfill drains in bounded micro-batches, same final result") {
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = tmpDir("rawbackfill")
    batch.repartition(6).write.mode("overwrite").parquet(dir) // 6-file backlog
    val files = spark.read.parquet(dir)
    val streamed = EventStream.windowedCounts(
      EventStream.readRawThrottled(spark, dir, files.schema, maxFilesPerTrigger = 2))
    val q = streamed.writeStream
      .outputMode("complete").format("memory").queryName("backfill")
      .option("checkpointLocation", tmpDir("ckpt_bf"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3,
      s"6 files at 2/trigger must take >= 3 micro-batches, got ${batches.length}")
    val maxRows = batches.map(_.numInputRows).max
    assert(maxRows < files.count(),
      s"no single micro-batch may swallow the whole backlog ($maxRows)")
    // and the drained result equals the one-shot batch aggregate
    val got = spark.table("backfill")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = files
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("mapGroupsWithState accumulates per-user running state") {
    val (dir, batch) = stageRawDir()
    val streamed = EventStream.runningUserState(
      EventStream.readRaw(spark, dir, batch.schema)
        .select("event_id", "user_id", "value").as[UserEvent])
    val got = EventStream.runAvailableNow(spark, streamed.toDF(), "user_state",
      tmpDir("ckpt2"), outputMode = "update")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = batch.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("transformWithState matches mapGroupsWithState on the same input") {
    val (dir, batch) = stageRawDir()
    def run(name: String, ckpt: String,
        f: org.apache.spark.sql.Dataset[UserEvent] => org.apache.spark.sql.Dataset[UserRunning]) =
      EventStream.runAvailableNow(spark,
        f(EventStream.readRaw(spark, dir, batch.schema)
          .select("event_id", "user_id", "value").as[UserEvent]).toDF(),
        name, tmpDir(ckpt), outputMode = "update")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
        .toMap
    // the TWS API requires the RocksDB provider — set it only for this run
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val tws =
      try run("user_state_tws", "ckpt_tws", EventStream.runningUserStateTws)
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    val legacy = run("user_state_legacy", "ckpt_legacy", EventStream.runningUserState)
    assert(tws === legacy, "the two stateful APIs must agree row-for-row")
    assert(tws.nonEmpty && tws.values.forall(_._1 > 0))
  }

  test("streaming dedup-within-watermark drops re-delivered event ids") {
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = tmpDir("rawdup")
    // write the same events TWICE (two files) — a redelivery scenario
    batch.coalesce(1).write.mode("overwrite").parquet(dir)
    batch.coalesce(1).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() === batch.count() * 2)
    val streamed = EventStream.dedupedStream(
      EventStream.readRaw(spark, dir, batch.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "dedup_stream",
      tmpDir("ckpt4"), outputMode = "append")
    assert(got.count() === batch.count(),
      "each event_id must survive exactly once")
  }

  test("stream-static enrichment join matches the batch join") {
    val (dir, batch) = stageRawDir()
    val dim = Seq(("click", "web"), ("purchase", "commerce"), ("view", "web"))
      .toDF("event_type", "category")
    val streamed = EventStream.enrichedStream(
      EventStream.readRaw(spark, dir, batch.schema), dim, "event_type")
      .select("event_id", "category")
    val got = EventStream.runAvailableNow(spark, streamed, "enriched",
      tmpDir("ckpt5"), outputMode = "append")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val want = batch.join(dim, Seq("event_type"), "left")
      .select("event_id", "category")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join matches the batch interval join") {
    val (dir, batch) = stageRawDir()
    def stream() = EventStream.readRaw(spark, dir, batch.schema)
    val streamed = EventStream.purchaseClickJoin(
      stream().filter(col("event_type") === "purchase"),
      stream().filter(col("event_type") === "click"))
    val got = EventStream.runAvailableNow(spark, streamed, "ss_join",
      tmpDir("ckpt6"), outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

    val p = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"), col("ts").as("c_ts"))
    val want = p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 hour") &&
        col("c_ts") <= col("p_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce at least one joined pair")
  }

  test("stream-stream LEFT OUTER join emits unmatched rows only after state closes") {
    val (dir, batch) = stageRawDir()
    def stream() = EventStream.readRaw(spark, dir, batch.schema)
    val streamed = EventStream.purchaseClickJoin(
      stream().filter(col("event_type") === "purchase"),
      stream().filter(col("event_type") === "click"),
      joinType = "leftOuter")
    val rows = EventStream.runAvailableNow(spark, streamed, "ss_left_join",
      tmpDir("ckpt_lo"), outputMode = "append").collect()
    val gotMatched = rows.filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val gotNulls = rows.filter(_.isNullAt(3)).map(_.getLong(0)).toSet

    val p = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"), col("ts").as("c_ts"))
    val cond = col("user_id") === col("c_user_id") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 hour") &&
      col("c_ts") <= col("p_ts")
    // matched rows must equal the batch INNER join exactly
    val wantMatched = p.join(c, cond).collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(gotMatched === wantMatched)

    // null rows: only for truly unmatched purchases, and every unmatched
    // purchase whose join window is provably closed MUST be present — the
    // no-data final micro-batch flushes them. "Closed" is governed by the
    // RIGHT stream's watermark (a purchase stays open while a matching
    // click could still arrive), i.e. max CLICK ts - 10 min delay — the
    // global max ts is the wrong bound because the purchase stream runs
    // hours past the last click. Extra 1h+30s slack covers Spark's
    // conservative state-watermark derivation from the interval bounds.
    val unmatched = p.join(c, cond, "left_anti")
    val maxClickMs = batch.filter(col("event_type") === "click")
      .agg(max("ts")).head().getTimestamp(0).getTime
    val closed = unmatched
      .filter(col("p_ts") <
        new java.sql.Timestamp(maxClickMs - (10 * 60 + 3600 + 30) * 1000L))
      .collect().map(_.getLong(0)).toSet
    val allUnmatched = unmatched.collect().map(_.getLong(0)).toSet
    assert(gotNulls.subsetOf(allUnmatched),
      s"null rows for matched purchases: ${gotNulls -- allUnmatched}")
    assert(closed.subsetOf(gotNulls),
      s"closed-window unmatched purchases not emitted: ${closed -- gotNulls}")
    assert(closed.nonEmpty, "fixture must contain closed unmatched purchases")
  }

  test("foreachBatch sink writes date-partitioned parquet, exactly-once per file") {
    val (dir, batch) = stageRawDir()
    val target = tmpDir("fbsink")
    val ckpt = tmpDir("ckpt7")
    def run() = EventStream.runForeachBatchSink(spark,
      EventStream.readRaw(spark, dir, batch.schema), target, ckpt)
    run()
    val written = spark.read.parquet(target)
    assert(written.count() === batch.count())
    assert(new java.io.File(target).listFiles()
      .count(_.getName.startsWith("batch_id=")) > 0, "must partition by batch id")
    assert(new java.io.File(target).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles())
      .count(_.getName.startsWith("date=")) > 0, "must partition by date")
    // second run, same checkpoint, no new files → nothing re-written
    run()
    assert(spark.read.parquet(target).count() === batch.count(),
      "replay with a committed checkpoint must not duplicate rows")
  }

  test("foreachBatch sink is idempotent under at-least-once batch REPLAY") {
    // Simulate the crash window foreachBatch exposes: the parquet write
    // job committed but the streaming checkpoint did not, so the SAME
    // batch (same id, same rows) is delivered to the sink again. The
    // committed-checkpoint test above cannot catch this — it never
    // re-enters the sink function.
    val (_, batch) = stageRawDir()
    val target = tmpDir("fbsink_replay")
    EventStream.writeBatchIdempotent(batch, batchId = 0L, target)
    val afterFirst = spark.read.parquet(target).count()
    EventStream.writeBatchIdempotent(batch, batchId = 0L, target) // replay
    assert(spark.read.parquet(target).count() === afterFirst,
      "replayed batch id must overwrite, not append")
    // a DIFFERENT batch id must append, not clobber batch 0
    EventStream.writeBatchIdempotent(batch.limit(10), batchId = 1L, target)
    assert(spark.read.parquet(target).count() === afterFirst + 10)
  }

  test("session windows match batch gap-based sessionization") {
    val (dir, batch) = stageRawDir()
    val gapSecs = 1800L
    val streamed = EventStream.sessionCounts(
      EventStream.readRaw(spark, dir, batch.schema), "30 minutes",
      watermark = None)
    val got = EventStream.runAvailableNow(spark, streamed, "sess_counts",
      tmpDir("ckpt_sess"), outputMode = "complete")
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0)) -> (r.getLong(3), r.getTimestamp(1)))
      .toMap

    // independent batch derivation: session windows are [start, last+gap)
    // with the END EXCLUSIVE, so an event exactly `gap` after its
    // predecessor starts a NEW session (>=, not >) — and the comparison
    // must run at the data's microsecond precision: whole-second
    // truncation would misclassify fractional gaps near the boundary
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val want = batch
      .withColumn("new_sess",
        when(unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w) >= gapSecs * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"),
        (max(col("ts")) + expr("INTERVAL 30 minutes")).as("session_end"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2)) -> (r.getLong(3), r.getTimestamp(4)))
      .toMap

    assert(got.size === want.size)
    assert(got === want)
    assert(got.nonEmpty, "fixture must contain at least one session")
  }

  test("streaming SCD2 upsert maintains a versioned dimension, idempotent under replay") {
    // change feed: events as CDC updates — key user_id, monotone ord
    // event_id, tracked (event_type, value). One file → one micro-batch,
    // so the final open row per key is the GLOBAL latest by event_id
    // (cross-batch ordering is the feed's contract, not the sink's).
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
    val dir = tmpDir("cdcfeed")
    batch.coalesce(1).write.mode("overwrite").parquet(dir)
    val dimDir = tmpDir("scd2dim") + "/dim"
    val tracked = Seq("event_type", "value")
    EventStream.runScd2Sink(spark,
      spark.readStream.schema(batch.schema).parquet(dir),
      dimDir, tmpDir("ckpt_scd2"), "user_id", "event_id", tracked)

    def snapshot() = spark.read.parquet(dimDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.get(4), r.getBoolean(5))).toSet
    val afterStream = snapshot()
    // open rows == latest-wins compaction of the whole feed
    val wantOpen = graft.operators.MergeOps.latestByKey(batch, "user_id", "event_id")
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getDouble(3))).toMap
    val gotOpen = afterStream.filter(_._6)
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(gotOpen === wantOpen)
    // first batch: no history yet — exactly one row per key
    assert(afterStream.size === wantOpen.size)

    // at-least-once REPLAY of the same batch (same id, same rows) must be
    // a fixpoint: the merge's no-op branch emits nothing
    EventStream.scd2UpsertBatch(spark, batch, 0L, dimDir,
      "user_id", "event_id", tracked)
    assert(snapshot() === afterStream, "replayed batch must not change the snapshot")

    // a genuine second batch versions the changed keys and keeps history
    val upd2 = graft.operators.MergeOps.latestByKey(batch, "user_id", "event_id")
      .filter(col("user_id") % 2 === 0)
      .withColumn("value", col("value") + 1.0)
      .withColumn("event_id", col("event_id") + 100000L)
    EventStream.scd2UpsertBatch(spark, upd2, 1L, dimDir,
      "user_id", "event_id", tracked)
    val after2 = spark.read.parquet(dimDir)
    val evenUsers = upd2.count()
    assert(after2.filter(!col("is_current")).count() === evenUsers,
      "every updated key must keep its closed v0 row")
    assert(after2.filter(col("is_current") && col("user_id") % 2 === 0)
      .filter(col("valid_from") === 1L).count() === evenUsers,
      "every updated key must have an open v1 row")
    assert(after2.count() === afterStream.size + evenUsers)
  }

  test("AvailableNow is exactly-once per file: second run with same checkpoint emits nothing new") {
    val (dir, batch) = stageRawDir()
    val ckpt = tmpDir("ckpt3")
    val build = () => EventStream.windowedCounts(
      EventStream.readRaw(spark, dir, batch.schema))
    EventStream.runAvailableNow(spark, build(), "once_a", ckpt, "complete")
    assert(spark.table("once_a").count() > 0)
    // same checkpoint, no new files → zero batches run, so the fresh
    // memory table stays empty: the files were NOT reprocessed
    EventStream.runAvailableNow(spark, build(), "once_b", ckpt, "complete")
    assert(spark.table("once_b").count() === 0)
  }
}
