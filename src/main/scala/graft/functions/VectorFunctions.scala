package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Static kernels shared by interpreted eval and generated code. */
object VectorUtil {
  /** Cosine similarity of two float vectors, accumulated in double in
    * element order (matches a sequential C++ loop — oracle-alignable).
    * Returns NaN for zero-norm inputs, 0-similarity on length mismatch.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
}

/** Custom Catalyst expression: cosine similarity over two `array<float>`
  * columns. Preference order per the design brief: built-ins can express
  * this via `aggregate(zip_with(...))`, but that allocates an intermediate
  * array per row and evaluates a lambda per element; a native binary
  * expression with `doGenCode` is one fused loop inside WholeStageCodegen —
  * the hot path of 100 TB similarity search.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Custom Catalyst expression: raw inner product over two `array<float>`
  * columns — the ranking kernel MIPS retrieval needs (recommendation
  * scores are inner products, NOT cosines: popular items earn long
  * vectors and cosine normalization erases exactly that popularity
  * signal). Same fused-loop/codegen rationale as [[CosineSimilarity]];
  * accumulation is double in element order, so an engine replaying the
  * same loop agrees bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for random-hyperplane LSH signatures — ONE code path for
  * executor-side (expression) and driver-side (query vector) signing, so
  * index build and probe can never disagree. Planes are deterministic
  * pseudo-random from a splitmix64 scramble of (plane, dim); the dot
  * product runs over the VECTOR's own length (no fixed-dim assumption).
  */
object LshSignatureUtil {
  final val Seed = 42

  def planeComponent(plane: Int, d: Int): Double = {
    var z = (plane.toLong << 32 | d.toLong) + 0x9e3779b97f4a7c15L + Seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 0xFFFFFL).toDouble / 0x80000L.toDouble - 1.0
  }

  def signatureOf(vec: Array[Float], planes: Int): Int =
    signatureOf(vec, planes, 0)

  /** `offset` selects an independent plane family (planes `offset` to
    * `offset + planes - 1`) — how multiband LSH derives band b's planes
    * (offset = b * planes) from the same deterministic stream.
    */
  def signatureOf(vec: Array[Float], planes: Int, offset: Int): Int = {
    var sig = 0
    var i = 0
    while (i < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * planeComponent(offset + i, d); d += 1 }
      if (dot >= 0) sig |= (1 << i)
      i += 1
    }
    sig
  }

  def signature(vec: ArrayData, planes: Int): Int =
    signature(vec, planes, 0)

  def signature(vec: ArrayData, planes: Int, offset: Int): Int = {
    var sig = 0
    var i = 0
    while (i < planes) {
      var dot = 0.0
      var d = 0
      val n = vec.numElements()
      while (d < n) { dot += vec.getFloat(d) * planeComponent(offset + i, d); d += 1 }
      if (dot >= 0) sig |= (1 << i)
      i += 1
    }
    sig
  }
}

/** Custom Catalyst expression: all-planes LSH signature in one fused pass
  * (the builtin formulation runs `planes` separate interpreted
  * zip_with+aggregate lambda chains per row).
  */
case class LshSignature(child: Expression, planes: Int, offset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes > 0 && planes <= 30, "bucket is an int bitmask")
  require(offset >= 0, "offset selects a plane family; must be >= 0")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_signature"

  override protected def nullSafeEval(input: Any): Any =
    LshSignatureUtil.signature(input.asInstanceOf[ArrayData], planes, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshSignatureUtil.signature($c, $planes, $offset)")

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object VectorFunctions {
  /** Native LSH signature column (see [[LshSignature]]); `offset` picks
    * an independent plane family for multiband candidate generation.
    */
  def lshSignature(embedding: Column, planes: Int, offset: Int = 0): Column =
    GraftShims.toColumn(LshSignature(GraftShims.toExpression(embedding), planes, offset))

  /** Native-expression cosine similarity (codegen'd fused loop). */
  def cosineSim(a: Column, b: Column): Column =
    GraftShims.toColumn(
      CosineSimilarity(GraftShims.toExpression(a), GraftShims.toExpression(b)))

  /** Native-expression inner product (codegen'd fused loop) — the MIPS
    * ranking kernel; see [[DotProduct]].
    */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.toColumn(
      DotProduct(GraftShims.toExpression(a), GraftShims.toExpression(b)))

  /** Builtin-composition cosine (zip_with + aggregate) — the (a)-tier
    * compose-existing-ops variant; kept for cross-checking the custom
    * expression in tests and for engines without the extension.
    */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val prod = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    prod / (sqrt(na) * sqrt(nb))
  }
}
