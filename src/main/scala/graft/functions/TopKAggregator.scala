package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Bounded-heap top-k aggregator (SURVEY §7.3(a)) — the UDAF surface of
  * the engine, registered as `graft_topk` via `functions.udaf`.
  *
  * Scale rationale: ranking "top-k neighbors per probe" with a window
  * function shuffles EVERY scored row to sort it; this Aggregator keeps
  * a k-element bounded heap per group on the map side, so the shuffle
  * carries at most k rows per (partition × group) — at 100 TB that is
  * the difference between shuffling the corpus and shuffling k rows.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `row_number() OVER (ORDER BY sim DESC, neighbor_id)` contract the
  * DuckDB oracles use, so results are deterministic and oracle-stable.
  */
final case class Scored(id: Long, score: Double)

object TopKAggregator {
  /** "Rank key": smaller = better (higher score; smaller id on ties). */
  val rankOrdering: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))
}

class TopKAggregator(k: Int)
    extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {
  import TopKAggregator.rankOrdering

  require(k > 0, s"k must be positive, got $k")

  // PriorityQueue.head is the MAX under rankOrdering = the worst kept row
  override def zero: mutable.PriorityQueue[Scored] =
    mutable.PriorityQueue.empty[Scored](rankOrdering)

  private def offer(b: mutable.PriorityQueue[Scored], s: Scored): mutable.PriorityQueue[Scored] = {
    if (b.size < k) b.enqueue(s)
    else if (rankOrdering.lt(s, b.head)) { b.dequeue(); b.enqueue(s) }
    b
  }

  override def reduce(b: mutable.PriorityQueue[Scored], a: Scored): mutable.PriorityQueue[Scored] =
    offer(b, a)

  override def merge(x: mutable.PriorityQueue[Scored], y: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] =
    y.foldLeft(x)(offer)

  /** Best-first (score desc, id asc on ties). */
  override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
    b.toSeq.sorted(rankOrdering)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
