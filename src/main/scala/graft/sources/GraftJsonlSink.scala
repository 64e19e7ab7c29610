package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = "graft-jsonl"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_READ)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftJsonlWriteBuilder(info)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "graft-jsonl requires option 'path'")
    require(writeSchema.nonEmpty,
      "graft-jsonl read requires an explicit .schema(...) — the format does " +
        "not infer (inference would read data files before checking the manifest)")
    new GraftJsonlScanBuilder(path, writeSchema)
  }
}

/** READ leg of the connector — the consumer side of the manifest
  * protocol: the scan lists ONLY the shards named in the commit markers
  * (`_MANIFEST.json` from a batch job, `_epoch-*.json` from a streaming
  * query), so an uncommitted/partial/orphaned `.jsonl` that a crashed
  * writer left in the directory is INVISIBLE — the reader enforcing the
  * marker is what makes the sink's publish atomic end-to-end (the same
  * contract an object-store table format provides, in miniature). A
  * directory with data files but no marker fails LOUDLY: silent
  * empty-scan would hide an aborted job. One InputPartition per shard;
  * column pruning pushed into the row parser.
  */
private[sources] class GraftJsonlScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-jsonl $path"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new File(path)
    val markers = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName == "_MANIFEST.json" || f.getName.startsWith("_epoch-"))
    require(markers.nonEmpty,
      s"graft-jsonl: no commit marker (_MANIFEST.json / _epoch-*.json) in $path — " +
        "the directory holds no committed data (a crashed or aborted write?)")
    val committed = markers.flatMap { m =>
      val body = new String(Files.readAllBytes(m.toPath), StandardCharsets.UTF_8)
      """"file":\s*"([^"]+)"""".r.findAllMatchIn(body).map(_.group(1))
    }.distinct.sorted
    committed.map(f =>
      JsonlShardPartition(new File(dir, f).getAbsolutePath): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    JsonlReaderFactory(tableSchema, required)
}

private[sources] case class JsonlShardPartition(file: String) extends InputPartition

private[sources] case class JsonlReaderFactory(tableSchema: StructType,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonlShardReader(p.asInstanceOf[JsonlShardPartition].file,
      tableSchema, required)
}

private[sources] class JsonlShardReader(file: String, tableSchema: StructType,
    required: StructType) extends PartitionReader[InternalRow] {
  private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val fields = GraftJsonlSink.parseFlat(it.next())
    current = InternalRow.fromSeq(required.fields.toSeq.map { f =>
      fields.get(f.name) match {
        case None | Some(null) => null
        case Some(v: String) => f.dataType match {
          case StringType => UTF8String.fromString(v)
          case other => throw new IllegalStateException(
            s"field '${f.name}' is a JSON string but schema says $other")
        }
        case Some(v: java.lang.Boolean) => v.booleanValue()
        case Some(v: java.lang.Long) => f.dataType match {
          case LongType    => v.longValue()
          case IntegerType => v.intValue()
          case DoubleType  => v.doubleValue()
          case other => throw new IllegalStateException(
            s"field '${f.name}' is a JSON integer but schema says $other")
        }
        case Some(v: java.lang.Double) => f.dataType match {
          case DoubleType  => v.doubleValue()
          case LongType    => v.longValue()
          case IntegerType => v.intValue()
          case other => throw new IllegalStateException(
            s"field '${f.name}' is a JSON number but schema says $other")
        }
        case Some(other) => throw new IllegalStateException(
          s"unexpected parsed value $other for '${f.name}'")
      }
    })
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
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

private[graft] object GraftJsonlSink {
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

  /** Strict parser for the flat one-line objects THIS sink writes
    * (string / number / boolean / null values, RFC 8259 escapes). Being
    * the writer's inverse is the whole spec — anything outside that
    * shape is a corruption and fails loudly rather than best-effort.
    * Numbers parse as Double (the reader narrows by schema).
    */
  def parseFlat(line: String): Map[String, Any] = {
    var i = 0
    val n = line.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"graft-jsonl parse: $msg at $i in: $line")
    def ws(): Unit = while (i < n && line.charAt(i) == ' ') i += 1
    def expect(c: Char): Unit = {
      if (i >= n || line.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < n && line.charAt(i) != '"') {
        line.charAt(i) match {
          case '\\' =>
            i += 1
            if (i >= n) fail("dangling escape")
            line.charAt(i) match {
              case '"'  => b.append('"')
              case '\\' => b.append('\\')
              case 'n'  => b.append('\n')
              case 'r'  => b.append('\r')
              case 't'  => b.append('\t')
              case 'u' =>
                if (i + 4 >= n) fail("short \\u escape")
                b.append(Integer.parseInt(line.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case c => fail(s"bad escape \\$c")
            }
          case c => b.append(c)
        }
        i += 1
      }
      expect('"')
      b.toString
    }
    def value(): Any = {
      ws()
      if (i >= n) fail("missing value")
      line.charAt(i) match {
        case '"' => string()
        case 't' => if (line.startsWith("true", i)) { i += 4; java.lang.Boolean.TRUE }
                    else fail("bad literal")
        case 'f' => if (line.startsWith("false", i)) { i += 5; java.lang.Boolean.FALSE }
                    else fail("bad literal")
        case 'n' => if (line.startsWith("null", i)) { i += 4; null }
                    else fail("bad literal")
        case _ =>
          val start = i
          while (i < n && "+-.eE0123456789".indexOf(line.charAt(i)) >= 0) i += 1
          if (i == start) fail("bad value")
          val lit = line.substring(start, i)
          // integer literals stay Long: routing them through Double would
          // corrupt ids above 2^53 — a real hazard for 64-bit keys
          if (lit.exists(c => c == '.' || c == 'e' || c == 'E'))
            java.lang.Double.valueOf(lit)
          else java.lang.Long.valueOf(lit)
      }
    }
    ws(); expect('{'); ws()
    val out = Map.newBuilder[String, Any]
    if (i < n && line.charAt(i) != '}') {
      var more = true
      while (more) {
        ws()
        val k = string()
        ws(); expect(':')
        out += k -> value()
        ws()
        if (i < n && line.charAt(i) == ',') { i += 1; more = true }
        else more = false
      }
    }
    expect('}')
    out.result()
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
