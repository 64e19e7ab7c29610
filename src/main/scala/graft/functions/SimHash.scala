package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernel shared by interpreted eval and generated code. */
object SimHashUtil {
  final val Seed = 42L

  /** 64-bit SimHash of a token array: per-token xxhash64, per-bit ±1
    * voting, sign of the vote becomes the output bit. Near-identical token
    * multisets → small Hamming distance.
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Custom Catalyst expression: SimHash64 over an `array<string>` token
  * column. A scalar fingerprint Spark's builtin surface cannot express
  * (per-bit voting across array elements); implemented as a native
  * `Expression` with `doGenCode` (stays inside WholeStageCodegen — a Scala
  * UDF here would break the codegen span and pay serialization per row).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point: `simhash64(tokens(col))`. */
  def simhash64(tokens: Column): Column =
    GraftShims.toColumn(SimHash64(GraftShims.toExpression(tokens)))
}
