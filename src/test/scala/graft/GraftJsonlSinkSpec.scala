package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.{GraftJsonlWriterFactory, JsonlCommit}

/** DataSourceV2 `graft-jsonl` SINK: round-trip fidelity, manifest-as-
  * commit-marker, two-phase commit protocol (task abort deletes staging;
  * job commit publishes only committed files and sweeps orphans),
  * overwrite truncation, and RFC 8259 escaping.
  */
class GraftJsonlSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("graft-jsonl").toFile
    d.deleteOnExit(); d
  }

  test("write + read-back round trip, manifest counts, no staging residue") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang")).limit(100)
    df.write.format("graft-jsonl").option("path", dir).mode("append").save()

    val files = new File(dir).listFiles().map(_.getName).sorted
    assert(files.exists(_.matches("shard-\\d{5}\\.jsonl")), files.mkString(","))
    assert(files.contains("_MANIFEST.json"))
    assert(!files.exists(_.startsWith("_staging")), "staging dir must be swept")

    val manifest = new String(
      Files.readAllBytes(Paths.get(dir, "_MANIFEST.json")))
    assert(manifest.contains("\"total_rows\": 100"), manifest)

    val back = spark.read.json(dir + "/*.jsonl")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
    assert(back.count() === 100)
    assert(back.except(df).isEmpty && df.except(back).isEmpty,
      "JSONL round trip must be lossless")
  }

  test("task abort deletes its staging file; commit message carries the row count") {
    val staging = tmpDir().getAbsolutePath
    val schema = StructType(Seq(StructField("s", StringType),
      StructField("n", LongType)))
    val factory = GraftJsonlWriterFactory(staging, schema)

    val aborted = factory.createWriter(0, 1L)
    aborted.write(InternalRow(UTF8String.fromString("x"), 1L))
    aborted.abort()
    assert(new File(staging).listFiles().isEmpty, "abort must remove the attempt file")

    val committed = factory.createWriter(0, 2L)
    committed.write(InternalRow(UTF8String.fromString("y"), 2L))
    committed.write(InternalRow(null, 3L))
    val msg = committed.commit().asInstanceOf[JsonlCommit]
    assert(msg.rows === 2L)
    assert(new File(staging, msg.stagedFile).exists())
    // retried attempts of one partition stage to DIFFERENT files
    assert(factory.createWriter(0, 3L) != null)
    assert(new File(staging).listFiles().count(_.getName.startsWith("part-00000")) >= 1)
  }

  test("overwrite truncates prior shards; orphaned staging files are not published") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft-jsonl").option("path", dir).mode("overwrite").save()
    val firstShards = new File(dir).listFiles()
      .count(_.getName.endsWith(".jsonl"))
    assert(firstShards >= 1)

    Seq((9L, "z")).toDF("id", "v").coalesce(1)
      .write.format("graft-jsonl").option("path", dir).mode("overwrite").save()
    val after = new File(dir).listFiles().map(_.getName).filter(_.endsWith(".jsonl"))
    assert(after.length === 1, s"stale shards must be truncated: ${after.mkString(",")}")
    val back = spark.read.json(dir + "/*.jsonl")
    assert(back.count() === 1)
    assert(back.select(sum(col("id"))).head.getLong(0) === 9L)
  }

  test("hostile strings survive: quotes, newlines, tabs, control chars") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    val nasty = "he said \"hi\"\\ \n\t end"
    Seq((1L, nasty)).toDF("id", "text")
      .write.format("graft-jsonl").option("path", dir).mode("append").save()
    val back = spark.read.json(dir + "/*.jsonl").select(col("text")).head.getString(0)
    assert(back === nasty)
  }

  test("streaming epochs publish keyed shards with per-epoch commit markers") {
    val root = tmpDir()
    val src = new File(root, "src"); src.mkdirs()
    val out = new File(root, "out").getAbsolutePath
    val ckpt = new File(root, "ckpt").getAbsolutePath
    // two source files + maxFilesPerTrigger=1 => two epochs
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src.getAbsolutePath)
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src.getAbsolutePath)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(src.getAbsolutePath)
    val q = stream.writeStream
      .format("graft-jsonl")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val names = new File(out).listFiles().map(_.getName).sorted
    assert(names.count(_.matches("_epoch-\\d+\\.json")) === 2,
      s"one commit marker per epoch: ${names.mkString(",")}")
    assert(names.count(_.matches("epoch-\\d+-shard-\\d{5}\\.jsonl")) >= 2)
    val back = spark.read.json(out + "/*.jsonl")
    assert(back.count() === 3)
    assert(back.select(sum(col("id"))).head.getLong(0) === 6L)
  }

  test("epoch replay overwrites itself: idempotent re-commit, no duplicates") {
    import graft.sources.GraftJsonlStreamingWriterFactory
    val root = tmpDir()
    val out = new File(root, "out"); out.mkdirs()
    val staging = new File(out, "_staging-q1"); staging.mkdirs()
    val schema = StructType(Seq(StructField("n", LongType)))
    val sw = {
      // drive the StreamingWrite directly — the unit form of the crash
      // window where the sink committed but the offset log did not
      val ctor = Class.forName("graft.sources.GraftJsonlStreamingWrite")
        .getDeclaredConstructors.head
      ctor.setAccessible(true)
      ctor.newInstance(out.getAbsolutePath, schema, "q1")
        .asInstanceOf[org.apache.spark.sql.connector.write.streaming.StreamingWrite]
    }
    def runEpoch(): Unit = {
      val f = GraftJsonlStreamingWriterFactory(staging.getAbsolutePath, schema)
      val w = f.createWriter(0, 7L, 5L)
      w.write(InternalRow(42L))
      val msg = w.commit()
      sw.commit(5L, Array(msg))
    }
    runEpoch()
    runEpoch() // replay of the SAME epoch
    val shards = out.listFiles().map(_.getName).filter(_.endsWith(".jsonl"))
    assert(shards.toSeq === Seq("epoch-5-shard-00000.jsonl"),
      s"replay must not duplicate: ${shards.mkString(",")}")
    assert(spark.read.json(out.getAbsolutePath + "/*.jsonl").count() === 1)
  }

  test("retried partition publishes exactly once; a lost executor's orphan never publishes") {
    // The crash matrix a real cluster produces, driven at the protocol
    // level (one JVM = one SparkContext, so a true local[2,2] retry
    // can't run inside the shared-session suite):
    //  - attempt 1 of partition 0 dies AFTER a partial write (abort)
    //  - attempt 2 of partition 0 succeeds (its message commits)
    //  - a lost executor leaves an orphan staging file and NO message
    val out = new File(tmpDir(), "out"); out.mkdirs()
    val schema = StructType(Seq(StructField("n", LongType)))
    val bw = {
      val ctor = Class.forName("graft.sources.GraftJsonlBatchWrite")
        .getDeclaredConstructors.head
      ctor.setAccessible(true)
      ctor.newInstance(out.getAbsolutePath, schema, "q-retry", Boolean.box(false))
        .asInstanceOf[org.apache.spark.sql.connector.write.BatchWrite]
    }
    val factory = bw.createBatchWriterFactory(null)
    val attempt1 = factory.createWriter(0, 1L)
    attempt1.write(InternalRow(111L)) // partial work of the dying attempt
    attempt1.abort()
    val attempt2 = factory.createWriter(0, 2L)
    attempt2.write(InternalRow(1L)); attempt2.write(InternalRow(2L))
    val msg = attempt2.commit()
    val orphan = factory.createWriter(1, 9L) // executor lost: no commit, no abort
    orphan.write(InternalRow(999L))
    bw.commit(Array(msg))

    val names = out.listFiles().map(_.getName).sorted
    assert(names.count(_.endsWith(".jsonl")) === 1, names.mkString(","))
    assert(!names.exists(_.startsWith("_staging")), "orphan staging swept")
    val back = spark.read.json(out.getAbsolutePath + "/*.jsonl")
    assert(back.count() === 2, "only the committed attempt's rows")
    assert(back.select(sum(col("n"))).head.getLong(0) === 3L,
      "neither the aborted 111 nor the orphan 999 may appear")
  }

  test("read leg: round trip through the SAME format, manifest-only visibility") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang")).limit(50)
    df.write.format("graft-jsonl").option("path", dir).mode("append").save()
    // a crashed writer's stray data file — present on disk, NOT in the
    // manifest: the reader must not see it
    Files.writeString(Paths.get(dir, "shard-99999.jsonl"),
      """{"doc_id": 424242, "text": "ghost", "lang": "xx"}""" + "\n")

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val back = spark.read.format("graft-jsonl").schema(schema)
      .option("path", dir).load()
    assert(back.count() === 50, "uncommitted shard must be invisible")
    assert(back.filter(col("doc_id") === 424242L).isEmpty)
    assert(back.except(df).isEmpty && df.except(back).isEmpty,
      "same-format round trip must be lossless")
    // column pruning reaches the reader factory's required schema
    assert(back.select("lang").distinct().count() >= 1)
  }

  test("read leg: a marker-less directory fails loudly, never empty-scans") {
    val dir = new File(tmpDir(), "orphan-only"); dir.mkdirs()
    Files.writeString(Paths.get(dir.getAbsolutePath, "shard-00000.jsonl"),
      """{"id": 1}""" + "\n")
    val schema = StructType(Seq(StructField("id", LongType)))
    val err = intercept[Exception] {
      spark.read.format("graft-jsonl").schema(schema)
        .option("path", dir.getAbsolutePath).load().count()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(err).exists(m => m != null && m.contains("commit marker")),
      s"got: ${chain(err).mkString(" | ")}")
  }

  test("read leg: streaming epochs are readable through their epoch markers") {
    val root = tmpDir()
    val src = new File(root, "src"); src.mkdirs()
    val out = new File(root, "out").getAbsolutePath
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src.getAbsolutePath)
    Seq((2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src.getAbsolutePath)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(src.getAbsolutePath)
      .writeStream.format("graft-jsonl").option("path", out)
      .option("checkpointLocation", new File(root, "ckpt").getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.format("graft-jsonl").schema(schema)
      .option("path", out).load()
    assert(back.count() === 2)
    assert(back.select(sum(col("id"))).head.getLong(0) === 3L)
  }

  test("parseFlat inverts toJson on hostile content") {
    import graft.sources.GraftJsonlSink
    val schema = StructType(Seq(StructField("s", StringType),
      StructField("n", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType)))
    val nasty = "a\"b\\c\nd\tef"
    val row = InternalRow(UTF8String.fromString(nasty), 42L, 2.5, true)
    val parsed = GraftJsonlSink.parseFlat(GraftJsonlSink.toJson(row, schema))
    assert(parsed("s") === nasty)
    assert(parsed("n") === 42L)
    assert(parsed("d") === 2.5)
    assert(parsed("b") === true)
    // 64-bit ids above 2^53 must NOT round-trip through Double
    val bigId = (1L << 53) + 1L
    val big = GraftJsonlSink.parseFlat(
      GraftJsonlSink.toJson(InternalRow(null, bigId, 0.0, false), schema))
    assert(big("n") === bigId, "integer literal must stay Long")
    val withNull = GraftJsonlSink.parseFlat(
      GraftJsonlSink.toJson(InternalRow(null, 1L, 0.0, false), schema))
    assert(withNull("s") === null)
  }

  test("non-atomic columns are rejected loudly, not silently mangled") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    val err = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr")
        .write.format("graft-jsonl").option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("atomic"), err.getMessage)
  }
}
