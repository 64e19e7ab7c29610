package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 batch SINK: `df.write.format("graft-jsonl").option("path",
  * dir).save()` — sharded JSONL delivery with a manifest, as a first-class
  * connector rather than a job-side helper ([[Sinks.exportJsonlShards]] is
  * the query-shaped sibling; this is the V2-write-protocol one).
  *
  * The point of the exercise is the TWO-PHASE COMMIT the V2 write API
  * encodes, implemented here the way an object-store committer would:
  *
  *  - each task writes to a STAGING file keyed by (partitionId, taskId) —
  *    speculative/retried attempts of the same partition write DIFFERENT
  *    staging files and never clobber each other;
  *  - task `commit()` returns the staging file name + row count as the
  *    commit message; task `abort()` deletes its own staging file;
  *  - driver `commit(messages)` publishes ONLY the files named in commit
  *    messages (rename into the destination — an orphaned staging file
  *    from a lost executor is ignored and swept), then writes
  *    `_MANIFEST.json` LAST — readers treat the manifest as the commit
  *    marker, so a crash mid-publish is invisible (no manifest, no data);
  *  - driver `abort()` deletes the staging directory wholesale.
  *
  * At 100 TB this exact protocol is what makes concurrent writers and
  * task retries safe; the local-FS rename stands in for an object-store
  * multipart-complete (single-file publish is atomic either way).
  *
  * Serialization is dependency-free deterministic JSON over atomic
  * types (string/long/int/double/boolean, RFC 8259 string escaping) —
  * fields in schema order, one object per line.
  */
class GraftJsonlProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  // Write-only source: schema comes from the DataFrame being written.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftJsonlTable(schema)
  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class GraftJsonlTable(writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft-jsonl"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftJsonlWriteBuilder(info)
}

private[sources] class GraftJsonlWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  // SaveMode.Overwrite arrives as truncate(); publish replaces the dir.
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    private def validatedPath: String = {
      val path = info.options.get("path")
      require(path != null && path.nonEmpty, "graft-jsonl requires option 'path'")
      GraftJsonlSink.validateSchema(info.schema())
      path
    }
    override def toBatch: BatchWrite =
      new GraftJsonlBatchWrite(validatedPath, info.schema(), info.queryId(), doTruncate)
    override def toStreaming: streaming.StreamingWrite =
      new GraftJsonlStreamingWrite(validatedPath, info.schema(), info.queryId())
  }
}

private[graft] case class JsonlCommit(stagedFile: String, rows: Long)
    extends WriterCommitMessage

private[sources] class GraftJsonlBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {

  private def stagingDir = new File(path, s"_staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = stagingDir
    dir.mkdirs()
    GraftJsonlWriterFactory(dir.getAbsolutePath, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new File(path)
    dest.mkdirs()
    if (truncate)
      Option(dest.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isFile && (f.getName.endsWith(".jsonl") || f.getName == "_MANIFEST.json"))
          f.delete()
      }
    val commits = messages.collect { case m: JsonlCommit => m }
    // publish ONLY committed staging files; orphans are swept below
    val shards = commits.zipWithIndex.map { case (m, i) =>
      val finalName = f"shard-$i%05d.jsonl"
      Files.move(Paths.get(stagingDir.getAbsolutePath, m.stagedFile),
        Paths.get(dest.getAbsolutePath, finalName),
        StandardCopyOption.ATOMIC_MOVE)
      (finalName, m.rows)
    }
    Option(stagingDir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    stagingDir.delete()
    // manifest LAST: it is the commit marker
    val body = shards
      .map { case (n, r) => s"""    {"file": "$n", "rows": $r}""" }
      .mkString("[\n", ",\n", "\n  ]")
    Files.write(Paths.get(dest.getAbsolutePath, "_MANIFEST.json"),
      (s"""{\n  "total_rows": ${shards.map(_._2).sum},\n""" +
        s"""  "n_shards": ${shards.length},\n  "shards": $body\n}\n""")
        .getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    Option(stagingDir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    stagingDir.delete()
  }
}

/** STREAMING leg of the sink — the per-EPOCH commit protocol Structured
  * Streaming drives (`writeStream.format("graft-jsonl")`). Same staging
  * discipline as the batch leg, with the epoch id folded into the
  * attempt key and into every published name:
  *
  *  - shards publish as `epoch-<id>-shard-<i>.jsonl` via
  *    REPLACE_EXISTING renames and the per-epoch marker
  *    `_epoch-<id>.json` is written LAST — so a REPLAYED epoch (the
  *    at-least-once crash window between sink commit and offset-log
  *    write) overwrites itself byte-for-byte instead of duplicating:
  *    idempotent re-publish IS the exactly-once story, the same
  *    batch-id-partition trick EventStream.writeBatchIdempotent uses at
  *    the foreachBatch tier, here encoded in the connector itself;
  *  - different epochs never collide (the epoch id is in the name), so
  *    no cross-epoch truncation is needed and the directory accumulates
  *    one shard set + one marker per epoch.
  */
private[sources] class GraftJsonlStreamingWrite(path: String,
    schema: StructType, queryId: String) extends streaming.StreamingWrite {

  private def stagingDir = new File(path, s"_staging-$queryId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    val dir = stagingDir
    dir.mkdirs()
    GraftJsonlStreamingWriterFactory(dir.getAbsolutePath, schema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dest = new File(path)
    dest.mkdirs()
    val commits = messages.collect { case m: JsonlCommit => m }
    val shards = commits.zipWithIndex.map { case (m, i) =>
      val finalName = f"epoch-$epochId-shard-$i%05d.jsonl"
      Files.move(Paths.get(stagingDir.getAbsolutePath, m.stagedFile),
        Paths.get(dest.getAbsolutePath, finalName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      (finalName, m.rows)
    }
    Option(stagingDir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    val body = shards
      .map { case (n, r) => s"""    {"file": "$n", "rows": $r}""" }
      .mkString("[\n", ",\n", "\n  ]")
    Files.write(Paths.get(dest.getAbsolutePath, s"_epoch-$epochId.json"),
      (s"""{\n  "epoch": $epochId,\n  "total_rows": ${shards.map(_._2).sum},\n""" +
        s"""  "n_shards": ${shards.length},\n  "shards": $body\n}\n""")
        .getBytes(StandardCharsets.UTF_8))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    Option(stagingDir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    stagingDir.delete()
  }
}

private[graft] case class GraftJsonlStreamingWriterFactory(stagingPath: String,
    schema: StructType) extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftJsonlDataWriter(stagingPath, schema, partitionId,
      taskId ^ (epochId << 20))
}

private[graft] case class GraftJsonlWriterFactory(stagingPath: String,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftJsonlDataWriter(stagingPath, schema, partitionId, taskId)
}

private[sources] class GraftJsonlDataWriter(stagingPath: String,
    schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // (partitionId, taskId) keys the attempt: a retry gets a new taskId and
  // therefore a new staging file — attempts never clobber each other.
  private val fileName = f"part-$partitionId%05d-$taskId.jsonl.tmp"
  private val file = new File(stagingPath, fileName)
  private val out = Files.newBufferedWriter(file.toPath, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write(GraftJsonlSink.toJson(record, schema))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    JsonlCommit(fileName, rows)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
  }

  override def close(): Unit = ()
}

private[sources] object GraftJsonlSink {
  def validateSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(f.dataType match {
        case StringType | LongType | IntegerType | DoubleType | BooleanType => true
        case _ => false
      }, s"graft-jsonl supports atomic columns only; '${f.name}' is ${f.dataType.simpleString}")
    }

  /** RFC 8259 string escaping: quote, backslash, and all control chars. */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  def toJson(row: InternalRow, schema: StructType): String = {
    val parts = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType  => "\"" + escape(row.getUTF8String(i).toString) + "\""
          case LongType    => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType  => row.getDouble(i).toString
          case BooleanType => row.getBoolean(i).toString
        }
      "\"" + escape(f.name) + "\": " + v
    }
    parts.mkString("{", ", ", "}")
  }
}
