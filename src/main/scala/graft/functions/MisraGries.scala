package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** One Misra-Gries counter: a surviving candidate token and its
  * (under-)estimate. Product shape so partial buffers shuffle as
  * Tungsten arrays-of-structs, like [[Scored]].
  */
final case class MgCounter(token: String, cnt: Long)

/** Mergeable Misra-Gries heavy-hitter summary over a token stream,
  * registered as `graft_mg(token[, k])`.
  *
  * The sketch that makes exact heavy-hitters a TWO-pass computation at
  * 100 TB: pass 1 reduces the corpus to ≤ k candidate tokens per
  * partial, with the mergeable-summaries guarantee (Agarwal et al.,
  * "Mergeable Summaries", PODS '12) that every token with true
  * frequency > n/(k+1) SURVIVES the merge tree — no false negatives.
  * Pass 2 exact-counts only the ≤ k candidates (a constant-size
  * broadcast), so the full groupBy over the open token vocabulary —
  * whose long tail dominates shuffle volume — never runs.
  *
  * reduce: the classic stream step — hit increments; miss inserts when
  * room, else decrements every counter (charging k+1 distinct tokens
  * one occurrence each, which is what bounds the error at n/(k+1)).
  * merge: counter-wise sum, then subtract the (k+1)-th largest count
  * and keep positives — the summary-merge that preserves the additive
  * error bound across the aggregation tree.
  *
  * finish returns candidates sorted by token: the ORDER is part of the
  * value, so downstream explodes are deterministic. Estimates are NOT
  * returned — they are sketch artifacts; the exact pass supplies counts.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Seq[MgCounter], Seq[String]] {

  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[MgCounter] = Vector.empty

  override def reduce(b: Seq[MgCounter], tok: String): Seq[MgCounter] = {
    val i = b.indexWhere(_.token == tok)
    if (i >= 0) b.updated(i, MgCounter(tok, b(i).cnt + 1))
    else if (b.length < k) b :+ MgCounter(tok, 1L)
    else b.map(c => MgCounter(c.token, c.cnt - 1)).filter(_.cnt > 0)
  }

  override def merge(x: Seq[MgCounter], y: Seq[MgCounter]): Seq[MgCounter] = {
    val summed = (x ++ y).groupBy(_.token).view
      .mapValues(_.map(_.cnt).sum).toVector
      .map { case (t, c) => MgCounter(t, c) }
    if (summed.length <= k) summed
    else {
      // subtract the (k+1)-th largest estimate; ≤ k survive as positive
      val cut = summed.map(_.cnt).sorted(Ordering[Long].reverse)(k)
      summed.map(c => MgCounter(c.token, c.cnt - cut)).filter(_.cnt > 0)
    }
  }

  override def finish(b: Seq[MgCounter]): Seq[String] =
    b.map(_.token).sorted

  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgCounter]]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
