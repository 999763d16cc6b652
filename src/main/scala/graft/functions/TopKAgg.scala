package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for the bounded top-k aggregate. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k UDAF (SURVEY §2.10 surface): keeps at most k
  * (score, id) pairs in every partial buffer, so the map-side combine
  * ships O(k) per group per task — the aggregation-shaped alternative
  * to a window rank when only the cap is wanted. At 100 TB a window
  * top-k shuffles EVERY row to its group's reducer first; this
  * aggregator reduces each partition to k rows before the exchange.
  *
  * Total order (score desc, id asc) makes the result deterministic
  * under any partitioning; `finish` renders the ids as a comma-joined
  * string (scalar cell for the oracle compare).
  */
class TopKIds(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], String] {
  // java.lang.Double.compare, not >: IEEE > is not a strict weak order
  // when NaN appears (sortWith could throw or order nondeterministically);
  // under compare, NaN ranks above every number, deterministically
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }
  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortWith(better).take(k)
  def zero: Seq[ScoredId] = Seq.empty
  def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = trim(b :+ a)
  def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] = trim(x ++ y)
  def finish(r: Seq[ScoredId]): String = trim(r).map(_.id).mkString(",")
  def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Size-capped sorted id collection: keeps the SMALLEST `cap`+1 ids in
  * every partial buffer. Downstream reads the result as "the full
  * (sorted) id set if the group has ≤ cap members, else a saturated
  * list of cap+1 ids" — a size filter then drops saturated groups, so
  * over-cap groups (ubiquitous hashes, boilerplate buckets) cost
  * O(cap) per PARTIAL buffer instead of materializing an unbounded
  * `collect_list` row before the filter. Keeping the smallest ids (not
  * the first seen) makes the surviving lists deterministic under any
  * partitioning. Input ids must be distinct per group (the callers'
  * window tables are per-doc deduped); the cap+1 saturation marker
  * needs no dedup to be correct either way.
  */
class CappedSortedIds(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val keep = cap + 1
  def zero: Seq[Long] = Seq.empty
  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    // fast path: saturated buffer and a sorts after everything kept
    if (b.length >= keep && a >= b.last) b
    else (b :+ a).sorted.take(keep)
  def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).sorted.take(keep)
  def finish(r: Seq[Long]): Seq[Long] = r
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
