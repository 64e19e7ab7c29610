package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch surface: merge aggregate + point-estimate expression
  * over the SERIALIZED form produced by Spark's builtin
  * `count_min_sketch(col, eps, confidence, seed)` aggregate (the builtin
  * gives only the binary blob; querying or merging it needs this pair).
  *
  * CMS counters are additive, so per-shard/per-day sketches merged here
  * are BIT-IDENTICAL to one sketch built over the union — the same
  * mergeability contract as the HLL tier (a12) and the MinHash union
  * (d12), witnessed by the a13 contract query. At 100 TB the pattern is:
  * sketch per ingest batch (map-side, constant memory), store the blobs,
  * merge on demand — never re-scan history to answer a frequency probe.
  */
object CountMinUtil {
  /** Point estimate from a serialized sketch. Deserializes per call —
    * meant for contract/report queries over aggregated rows (one per
    * group), NOT for per-row probing of a corpus; for that, deserialize
    * once and broadcast the sketch object.
    */
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(item)

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(a))
    val sb = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    sa.mergeInPlace(sb)
    val out = new java.io.ByteArrayOutputStream()
    sa.writeTo(out)
    out.toByteArray
  }
}

/** `cms_estimate(sketch, item)` as a native expression (codegen'd via the
  * static kernel; acceptable off the hot path — see [[CountMinUtil]]).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    CountMinUtil.estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, i) => s"graft.functions.CountMinUtil.estimate($s, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Merge aggregate over serialized count-min sketches (all inputs must
  * share eps/confidence/seed — CMS merge requires identical hash
  * geometry; `mergeInPlace` throws on mismatch rather than corrupting).
  * Buffer stays serialized: group counts here are shard/day-level (small),
  * and a deserialized buffer would need a custom encoder for no gain.
  */
class CmsUnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Array.emptyByteArray

  override def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] =
    if (sk == null || sk.isEmpty) buf
    else if (buf.isEmpty) sk
    else CountMinUtil.mergeBytes(buf, sk)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else CountMinUtil.mergeBytes(a, b)

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CountMin {
  import org.apache.spark.sql.GraftShims.{toColumn, toExpression}

  /** Column API: `cmsEstimate(sketchCol, itemCol)`. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    toColumn(CmsEstimate(toExpression(sketch), toExpression(item)))

  /** Column API: `cmsUnion(sketchCol)` inside `.agg(...)`. */
  def cmsUnion(sketch: Column): Column =
    udaf(new CmsUnionAgg, ExpressionEncoder[Array[Byte]]()).apply(sketch)
}
