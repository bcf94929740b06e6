package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Bounded-heap top-k aggregator (SURVEY §7.3(a)) — the UDAF surface of
  * the engine, registered as `graft_topk(id, score[, k])` via
  * [[graft.plans.GraftExtensions]].
  *
  * Scale rationale: ranking "top-k neighbors per probe" with a window
  * function shuffles EVERY scored row to sort it; this Aggregator keeps
  * a k-element bounded buffer per group on the map side, so the shuffle
  * carries at most k rows per (partition × group) — at 100 TB that is
  * the difference between shuffling the corpus and shuffling k rows.
  *
  * Buffer is a plain `Seq[Scored]` with a product ExpressionEncoder —
  * partial buffers serialize as Tungsten arrays-of-structs at shuffle
  * boundaries (no Kryo round-trip per partial merge). Between updates
  * the buffer lives as an object (TypedImperativeAggregate), so the
  * O(k) linear worst-scan per insert is the only per-row cost.
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
    extends org.apache.spark.sql.expressions.Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  import TopKAggregator.rankOrdering

  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Scored] = Vector.empty

  /** Keep the k best; when full, replace the worst kept row if beaten. */
  private def offer(b: Seq[Scored], s: Scored): Seq[Scored] =
    if (b.length < k) b :+ s
    else {
      var wi = 0
      var i = 1
      while (i < b.length) {
        if (rankOrdering.gt(b(i), b(wi))) wi = i
        i += 1
      }
      if (rankOrdering.lt(s, b(wi))) b.updated(wi, s) else b
    }

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = offer(b, a)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    y.foldLeft(x)(offer)

  /** Best-first (score desc, id asc on ties). */
  override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(rankOrdering)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
