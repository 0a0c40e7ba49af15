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

  /** Primitive grouped top-k over (group, score, id) rows — the same
    * selection as [[topK]] (score DESC, id ASC, total and
    * deterministic) without its per-row aggregation-buffer boundary:
    * a mapPartitions pass folds each partition's stream into bounded
    * per-group insertion-sorted arrays (memory: groups-per-partition
    * × k slots), then the typed aggregator merges the ≤ k-per-
    * (group, partition) remainder, whose cardinality is tiny by
    * construction. Measured on the 500k×8-query ADC batch: the typed
    * aggregator alone paid ~2 s for 4M candidate rows; the primitive
    * pass folds the same stream at scan speed. Use when the candidate
    * stream is large and the group count is bounded (query batches);
    * plain [[topK]] stays the right call for high-cardinality groups
    * (per-doc buffers), where per-partition arrays would not be
    * bounded. */
  def primitiveTopK(rows: org.apache.spark.sql.Dataset[(Long, Double, Long)],
                    k: Int): org.apache.spark.sql.DataFrame = {
    val sess = rows.sparkSession
    import sess.implicits._
    val kk = k
    val partial = rows.mapPartitions { it =>
      // parallel arrays per group, kept sorted (score desc, id asc)
      val scores = new scala.collection.mutable.LongMap[Array[Double]]()
      val ids = new scala.collection.mutable.LongMap[Array[Long]]()
      val sizes = new scala.collection.mutable.LongMap[Int]()
      // The same TOTAL order as TopKAggregator's
      // Ordering.by(r => (-r.score, r.id)): compare the NEGATED scores
      // via java.lang.Double.compare, so NaN (= -NaN, greatest under
      // compare) stays the WORST element in both layers — the naive
      // `s1 > s2` form let a NaN arriving first occupy slot 0 and block
      // every later insertion for its group (nothing compares greater
      // than NaN), and -0.0 == 0.0 ties broke differently from the
      // merge layer (ADVICE r13).
      def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
        val c = java.lang.Double.compare(-s1, -s2)
        c < 0 || (c == 0 && i1 < i2)
      }
      while (it.hasNext) {
        val (g, sc, id) = it.next()
        val sa = scores.getOrNull(g)
        if (sa == null) {
          val s = new Array[Double](kk); val i = new Array[Long](kk)
          s(0) = sc; i(0) = id
          scores.update(g, s); ids.update(g, i); sizes.update(g, 1)
        } else {
          val ia = ids(g); val n = sizes(g)
          if (n < kk || better(sc, id, sa(n - 1), ia(n - 1))) {
            var j = math.min(n, kk - 1)
            while (j > 0 && better(sc, id, sa(j - 1), ia(j - 1))) {
              sa(j) = sa(j - 1); ia(j) = ia(j - 1); j -= 1
            }
            sa(j) = sc; ia(j) = id
            if (n < kk) sizes.update(g, n + 1)
          }
        }
      }
      scores.keysIterator.toArray.iterator.flatMap { g =>
        val sa = scores(g); val ia = ids(g); val n = sizes(g)
        (0 until n).iterator.map(j => (g, sa(j), ia(j)))
      }
    }
    partial
      .groupByKey(_._1)
      .mapValues(t => ScoredRow(t._2, t._3))
      .agg(topK(kk).name("top"))
      .toDF("g", "top")
  }
}
