package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-dimension sufficient statistics (count, sum, sum-of-squares) of
  * an embedding column in ONE pass, in EXACT integer arithmetic — the
  * normalization-layer aggregate (per-dim mean/variance for z-scoring
  * a corpus before training) done without exploding n×d rows.
  *
  * Components scale to micro-units with `floor` (deterministic in IEEE
  * doubles; half-way rounding is engine-divergent), then sum as longs:
  * associative, so Spark's partial aggregation can reassociate freely —
  * a float sum would drift run to run. The shuffle carries ONE
  * (2·dim+1)-long state per partition after map-side combine; the
  * `posexplode → groupBy dim` formulation shuffles dim× the table.
  *
  * Overflow bound: |component| ≤ 4 ⇒ micro² ≤ 1.6e13 per element, so
  * the squared sum stays inside signed-64 up to ~5.7e5 rows per
  * partial and ~2^63/1.6e13 ≈ 5.7e5 × partials merged — at true 100 TB
  * row counts the same state widens to a (sum, carry) pair or the
  * scale drops to milli-units; the STRUCTURE (one mergeable state, no
  * explode) is the part that carries over unchanged.
  */
class VectorStatsAgg(dim: Int)
    extends Aggregator[Seq[Float], VectorStatsState, VectorStatsResult] {
  require(dim >= 1, "need at least one dimension")

  override def zero: VectorStatsState =
    VectorStatsState(Array.fill(dim)(0L), Array.fill(dim)(0L), 0L)

  override def reduce(b: VectorStatsState, emb: Seq[Float]): VectorStatsState = {
    if (emb != null && emb.length == dim) {
      var d = 0
      while (d < dim) {
        val m = math.floor(emb(d).toDouble * 1e6).toLong
        b.sums(d) += m
        b.sumsqs(d) += m * m
        d += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(a: VectorStatsState, b: VectorStatsState): VectorStatsState = {
    var d = 0
    while (d < dim) { a.sums(d) += b.sums(d); a.sumsqs(d) += b.sumsqs(d); d += 1 }
    a.n += b.n
    a
  }

  override def finish(r: VectorStatsState): VectorStatsResult =
    VectorStatsResult(r.n, r.sums.toIndexedSeq, r.sumsqs.toIndexedSeq)

  override def bufferEncoder: Encoder[VectorStatsState] = ExpressionEncoder()
  override def outputEncoder: Encoder[VectorStatsResult] = ExpressionEncoder()
}

/** Mutable partial state: micro-unit sums, squared-micro sums, count. */
case class VectorStatsState(sums: Array[Long], sumsqs: Array[Long], var n: Long)

/** Final result: valid-row count + per-dimension integer sums. */
case class VectorStatsResult(n: Long, sums: Seq[Long], sumsqs: Seq[Long])

object VectorStatsAgg {
  /** Column-API entry: one-pass per-dimension (n, Σmicro, Σmicro²). */
  def vectorStats(embedding: Column, dim: Int): Column =
    udaf(new VectorStatsAgg(dim)).apply(embedding)
}
