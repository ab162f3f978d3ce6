package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate flowing into the top-k aggregator. */
case class ScoredId(id: Long, score: Double)

/** Typed top-k aggregator: keeps the k best (score desc, id asc) per
  * group with partial aggregation — each partition reduces to ≤k rows
  * before the shuffle, so per-group top-k costs O(k) network instead of
  * shuffling every candidate row like the ranked-window formulation.
  * This is the formulation that survives 100 TB (two-phase top-k per the
  * distributed top-k search literature in PAPERS.md); the window variant
  * (q42) is its oracle-checkable twin.
  *
  * Exact, order-insensitive: merge order cannot change the top-k set,
  * and the output is re-sorted, so results are deterministic.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = best(buf :+ a)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] = best(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = best(r)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
