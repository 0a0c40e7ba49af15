package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{lit, pmod}

/** Window specs for PROVABLY-BOUNDED relations (top-k-limited search
  * branches, per-query reference lists, ≤1k-bucket aggregates).
  *
  * A bare `Window.orderBy(...)` has an empty partition spec, so every
  * such window — even over a 10-row relation — logs WindowExec's
  * "No Partition Defined" warning, and the noise masks any FUTURE
  * genuinely-unpartitioned window over big data. These helpers
  * partition on a constant-valued but NON-FOLDABLE key derived from a
  * data column (`pmod(key, 1)` ≡ 0 for non-negative keys; Catalyst
  * folds a literal `partitionBy(lit(1))` back to an empty spec, which
  * is why that classic trick does not silence the warning). Execution
  * is identical — one hash partition holding the whole (bounded)
  * relation — but the partition spec survives optimization, so the
  * bench/verify logs stay warning-free and a remaining WindowExec
  * warning is a REAL scale bug by construction.
  *
  * Callers must pass an INTEGRAL, never-null key column (ids, counts) —
  * `pmod(integral, 1)` is identically 0. The helper is NOT for
  * unbounded relations: partitioning by a constant moves everything to
  * one task, which is only acceptable because the input is already
  * k-bounded.
  */
object BoundedWindow {
  /** Constant-valued (0), non-foldable partition key over `key`. */
  def constKey(key: Column): Column = pmod(key, lit(1))

  /** `Window.partitionBy(constKey(key)).orderBy(order…)` — the bounded
    * replacement for `Window.orderBy(order…)`. */
  def orderBy(key: Column, order: Column*): WindowSpec =
    Window.partitionBy(constKey(key)).orderBy(order: _*)

  /** Whole-relation frame (scalar propagation over a tiny agg
    * relation) — the bounded replacement for
    * `Window.partitionBy().rowsBetween(unboundedPreceding,
    * unboundedFollowing)`: with no ordering, the frame is already the
    * entire partition. */
  def all(key: Column): WindowSpec = Window.partitionBy(constKey(key))
}
