package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise CENTROID of an embedding column in EXACT integer
  * arithmetic: each component is scaled to micro-units with `floor`
  * (deterministic in IEEE doubles on any engine, unlike half-way
  * rounding modes), summed as longs (associative — float sums would
  * reassociate under Spark's partial aggregation and differ run to
  * run), and the mean taken with TRUNCATING integer division (JVM
  * `Long /` == DuckDB BIGINT `//`, both toward zero; `Math.floorDiv`
  * would differ by 1 on negative non-exact means).
  *
  * `Aggregator`, not an explode: the shuffle carries ONE (dim+1)-long
  * state per (group × partition) after map-side partial aggregation —
  * the `posexplode → groupBy (label, dim)` formulation shuffles dim×
  * the table instead. Same scale shape as [[MinHashUnionAgg]].
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Float], CentroidState, Seq[Long]] {
  require(dim >= 1, "need at least one dimension")

  override def zero: CentroidState = CentroidState(Array.fill(dim)(0L), 0L)

  override def reduce(b: CentroidState, emb: Seq[Float]): CentroidState = {
    if (emb != null && emb.length == dim) {
      var d = 0
      while (d < dim) {
        b.sums(d) += math.floor(emb(d).toDouble * 1e6).toLong
        d += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(a: CentroidState, b: CentroidState): CentroidState = {
    var d = 0
    while (d < dim) { a.sums(d) += b.sums(d); d += 1 }
    a.n += b.n
    a
  }

  override def finish(r: CentroidState): Seq[Long] =
    if (r.n == 0L) Seq.empty
    else r.sums.map(_ / r.n).toIndexedSeq

  override def bufferEncoder: Encoder[CentroidState] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Mutable partial state: elementwise micro-unit sums + member count. */
case class CentroidState(sums: Array[Long], var n: Long)

object CentroidAgg {
  /** Column-API entry: scaled-integer centroid of `embedding`. */
  def centroid(embedding: Column, dim: Int): Column =
    udaf(new CentroidAgg(dim), ExpressionEncoder[Seq[Float]]())
      .apply(embedding)
}
