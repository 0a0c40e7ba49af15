package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` (SURVEY.md §2.12
  * "top-k-by-score buffer"): unlike the window form
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`), which
  * sort-shuffles EVERY row of every group, this aggregator is
  * partial-aggregatable — each map task keeps at most k rows per group
  * and the shuffle carries k rows per (group, partition) instead of the
  * whole table. At 100 TB with bounded k this is the difference between
  * shuffling the corpus and shuffling a candidate set.
  *
  * Ordering is total (score DESC, id ASC tiebreak), so the result is
  * deterministic and independent of partitioning/merge order:
  * top-k(A ∪ B) == top-k(top-k(A) ∪ top-k(B)).
  */
final case class ScoredRow(score: Double, id: Long)

class TopKAggregator(k: Int) extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {
  private val ord: Ordering[ScoredRow] =
    Ordering.by((r: ScoredRow) => (-r.score, r.id))

  override def zero: Seq[ScoredRow] = Vector.empty

  private def trim(rows: Seq[ScoredRow]): Seq[ScoredRow] =
    rows.sorted(ord).take(k)

  override def reduce(buf: Seq[ScoredRow], row: ScoredRow): Seq[ScoredRow] =
    // cheap accept test: only sort when the buffer can change
    if (buf.size < k || ord.lt(row, buf.last)) trim(buf :+ row) else buf

  override def merge(a: Seq[ScoredRow], b: Seq[ScoredRow]): Seq[ScoredRow] =
    trim(a ++ b)

  override def finish(buf: Seq[ScoredRow]): Seq[ScoredRow] = trim(buf)

  override def bufferEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
  override def outputEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
}

object TopK {
  /** Typed column: top-k (score desc, id asc) rows per group. */
  def topK(k: Int): TypedColumn[ScoredRow, Seq[ScoredRow]] =
    new TopKAggregator(k).toColumn
}
