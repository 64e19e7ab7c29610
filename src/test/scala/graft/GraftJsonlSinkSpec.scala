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

  test("non-atomic columns are rejected loudly, not silently mangled") {
    val dir = new File(tmpDir(), "out").getAbsolutePath
    val err = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr")
        .write.format("graft-jsonl").option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("atomic"), err.getMessage)
  }
}
