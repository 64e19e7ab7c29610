package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Misra-Gries FREQUENT-ITEMS sketch as a typed aggregate: per-group
  * top-k items with approximate counts in CONSTANT memory (`capacity`
  * counters), single pass, mergeable.
  *
  * The 100 TB story: the exact formulation (`groupBy(group, item)` then a
  * top-k window) shuffles the full DISTINCT item universe — for web-scale
  * token streams that is billions of keys. Misra-Gries shuffles one
  * ≤`capacity`-entry map per (group × partition) after map-side partial
  * aggregation, independent of the item universe. Guarantees (classic MG
  * + the Agarwal et al. mergeable-summaries merge):
  *  - estimated count ∈ [true - N/(capacity+1), true] (never overcounts);
  *  - any item with true frequency > N/(capacity+1) is IN the summary —
  *    with capacity sized to 1/supportThreshold, no true heavy hitter is
  *    ever missed;
  *  - when `capacity` ≥ the group's distinct-item count, no decrement
  *    ever fires and every count is EXACT (how the registered query is
  *    oracle-proven against DuckDB's exact top-k).
  *
  * `merge` sums counters pointwise, then subtracts the (capacity+1)-th
  * largest count from every counter and drops the non-positive — the
  * error bounds add, preserving the N/(capacity+1) guarantee under any
  * merge tree (partition-invariance asserted in `HeavyHittersSpec`).
  */
class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[TermCount]] {
  require(capacity >= 1, "capacity must be >= 1")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (item != null) {
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None =>
          if (buf.size < capacity) buf.update(item, 1L)
          else {
            // classic MG step: decrement every counter, evict zeros
            val dead = mutable.ArrayBuffer.empty[String]
            buf.foreach { case (k, c) =>
              if (c <= 1L) dead += k else buf.update(k, c - 1) }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0
      val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else a.update(k, c - cut) }
      dead.foreach(a.remove)
    }
    a
  }

  /** Full surviving summary, deterministically ordered (count desc, then
    * term) — callers slice their own top-k.
    */
  override def finish(r: mutable.Map[String, Long]): Seq[TermCount] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => TermCount(t, c) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}

/** One summary entry: an item and its (under-)estimated count. */
case class TermCount(term: String, cnt: Long)

object HeavyHittersAgg {
  /** Column-API entry: `heavyHitters(itemCol, capacity)` inside `.agg`. */
  def heavyHitters(item: Column, capacity: Int): Column =
    udaf(new HeavyHittersAgg(capacity), ExpressionEncoder[String]())
      .apply(item)
}
