package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** K-MINIMUM-VALUES distinct sketch (Bar-Yossef et al. 2002; the
  * "bottom-k" sketch of Cohen & Kaplan): per group, the k smallest
  * DISTINCT 64-bit hash values, in CONSTANT memory.
  *
  * What it adds over the HLL (a12) / CMS (a13) sketches already in the
  * family: a bottom-k sketch is a uniform SAMPLE of the hashed universe,
  * so two groups' sketches compose into SET-OPERATION estimates — the k
  * smallest of K(A) ∪ K(B) is exactly the KMV sketch of A ∪ B, and the
  * fraction of those present in both sketches estimates Jaccard — which
  * HLL fundamentally cannot do for intersections. At 100 TB this answers
  * "how many users do both X and Y" from two kilobyte-sized summaries
  * with no re-scan and no full user_id shuffle.
  *
  * Representation: values are stored FLIPPED (`hash ^ Long.MinValue`),
  * which maps unsigned hash order onto signed order — the buffer stays a
  * plain sorted Seq[Long], and downstream `array_sort` /
  * `array_intersect` / `element_at` Column ops compose sketches without
  * a second custom aggregate. The estimator reads the k-th smallest
  * flipped value y as the real number h = y + 2⁶³ ∈ [0, 2⁶⁴) and returns
  * (k−1)·2⁶⁴/h; a sketch still below capacity is EXACT (it holds every
  * distinct hash seen), which is also why the sf0.01 gate pins exact
  * behavior while sf0.1 exercises the estimation regime.
  *
  * `reduce` is O(log k) per skipped row (the common case once the buffer
  * fills — expected inserts are only k·ln(n/k)); `merge` is one O(k)
  * sorted-distinct merge, associative and commutative, so the sketch is
  * partition-invariant (asserted in the spec).
  */
class KmvSketchAgg(k: Int)
    extends Aggregator[java.lang.Long, mutable.ArrayBuffer[Long], Seq[Long]] {
  require(k >= 16, s"KmvSketchAgg: k=$k too small for a meaningful estimate")

  override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

  private def insertionPoint(buf: mutable.ArrayBuffer[Long], y: Long): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < y) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(buf: mutable.ArrayBuffer[Long],
      hash: java.lang.Long): mutable.ArrayBuffer[Long] = {
    if (hash != null) {
      val y = hash.longValue ^ Long.MinValue // unsigned order as signed
      if (buf.length < k || y < buf(buf.length - 1)) {
        val i = insertionPoint(buf, y)
        if (i >= buf.length || buf(i) != y) { // distinct only
          buf.insert(i, y)
          if (buf.length > k) buf.remove(buf.length - 1)
        }
      }
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[Long],
      b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val out = mutable.ArrayBuffer.empty[Long]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val y = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (out.isEmpty || out(out.length - 1) != y) out += y // dedup ties
    }
    out
  }

  override def finish(buf: mutable.ArrayBuffer[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
