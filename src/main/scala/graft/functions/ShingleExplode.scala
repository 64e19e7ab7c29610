package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (the `Generator` leg of the custom-
  * extension trio, next to the scalar `Expression`s and the typed
  * `Aggregator`s): STREAMS `(pos, gram)` rows of word `n`-grams straight
  * out of a token array.
  *
  * vs `explode(shinglesK(toks, n))` (the builtin composition used by the
  * t11/d9 oracles): the compose-ops form materializes the ENTIRE shingle
  * array per row before the generator runs — n× the token text in fresh
  * UTF8 strings held live at once, which for a 1 MB document at n = 13
  * (the GPT-3 decontamination width) is ~13 MB of transient allocation
  * per row. The generator builds one gram per `next()` call; peak extra
  * memory is a single gram regardless of document size. Emitted
  * lazily into `GenerateExec`, which also applies any downstream limit
  * BEFORE the remaining grams are built.
  *
  * Reference scope: the reference defines no UDTFs (SURVEY.md §2.11);
  * this exists for the extension tier's corpus operators.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_explode expects array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val m = arr.numElements()
      val sep = UTF8String.fromString(" ")
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= m - n
        override def next(): InternalRow = {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          val row = InternalRow(i, UTF8String.concatWs(sep, parts: _*))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  import org.apache.spark.sql.{Column, GraftShims}

  /** Column-API entry: `select(shingleExplode(tokens(col), 5))` yields
    * `(pos, gram)` rows through a single `Generate` node.
    */
  def shingleExplode(tokens: Column, n: Int): Column =
    GraftShims.toColumn(ShingleExplode(GraftShims.toExpression(tokens), n))
}
