package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan 2005, public) as a
  * typed, partial-aggregable Aggregator — the mergeable-frequency
  * member of the sketch family (HLL distinct, percentile_approx,
  * Bloom, Misra–Gries already ship). The buffer is a FIXED d×w cell
  * array: reduce increments one cell per hash row, merge is
  * elementwise addition, so the shuffle carries d·w longs per map
  * partition regardless of the key universe — where the exact
  * groupBy-on-key count shuffles every distinct key. Estimates are
  * upward-biased: est(t) = min_r cells(r·w + h_r(t)) ≥ true(t), with
  * the classic overestimate bound (ε = e/w of the total mass w.h.p.).
  * Callers precompute the d column indices as md5-derived bucket
  * columns (codegen), so the whole sketch — cells and estimates —
  * replays hash-exactly in a DuckDB oracle.
  */
class CmsAggregator(d: Int, w: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], cols: Seq[Int]): Array[Long] = {
    var r = 0
    while (r < d) { buf(r * w + cols(r)) += 1L; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** HyperLogLog registers (Flajolet, Fusy, Gandouet & Meunier 2007,
  * public) as a typed, partial-aggregable Aggregator — the mergeable
  * REGISTER form of the distinct sketch (`approx_count_distinct`
  * demonstrates Spark's built-in HLL++, but its sketch state is
  * opaque; this one exposes the m registers so cross-shard register
  * merge, union cardinality, and the DuckDB oracle replay are all
  * possible). Input rows are (bucket, rho) pairs precomputed as
  * md5-derived codegen columns; the buffer is a FIXED m-register int
  * array, reduce takes the elementwise max at one bucket, merge is
  * elementwise max — so the shuffle carries m ints per map partition
  * regardless of cardinality, and merging shard sketches is exact
  * (max is idempotent/commutative/associative: union sketch ==
  * whole-corpus sketch, which is the property that makes HLL the
  * standard distributed distinct counter).
  */
class HllAggregator(m: Int)
    extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(buf: Array[Int], br: Seq[Int]): Array[Int] = {
    val b = br(0); val rho = br(1)
    if (rho > buf(b)) buf(b) = rho
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object Sketches {
  /** Typed column folding (d column indices per occurrence) into the
    * d×w Count-Min cell array. */
  def countMin(d: Int, w: Int): TypedColumn[Seq[Int], Seq[Long]] =
    new CmsAggregator(d, w).toColumn

  /** Typed column folding (bucket, rho) pairs into m HLL registers. */
  def hll(m: Int): TypedColumn[Seq[Int], Seq[Int]] =
    new HllAggregator(m).toColumn
}
