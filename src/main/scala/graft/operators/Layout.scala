package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-layout operators for multi-dimensional scan pruning —
  * the lakehouse Z-ORDER: interleave the bits of two dimension keys
  * so rows close in BOTH dimensions land close on the space-filling
  * curve, then range-partition + sort files by the curve value. A
  * predicate on EITHER dimension then touches a bounded band of
  * files instead of all of them (single-column sorting only prunes
  * its own column; at 100 TB the difference is reading one file vs a
  * full shard for a two-column point query).
  *
  * The curve math is pure integer bit arithmetic — identical in both
  * engines, so the layout decision itself sits under the exact
  * oracle; the file-level pruning effect is spec-asserted on real
  * written files (LayoutSpec).
  */
object Layout {

  /** Morton/Z value of two non-negative integral columns, `bits` bits
    * each (z < 2^(2·bits)): bit b of x lands at position 2b, bit b of
    * y at 2b+1. */
  def zCol(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** DuckDB replay of `zCol` (BIGINT expressions). */
  def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) * ${1L << (2 * b)} + (($y >> $b) & 1) * ${1L << (2 * b + 1)})"
    }.mkString("(", " + ", ")")

  /** Z-ordered writer: range-partition on the curve value (so file k
    * holds one contiguous curve band) and sort within partitions (so
    * row groups inside a file are banded too — parquet min/max stats
    * prune at both granularities). */
  def zorderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                  path: String, nFiles: Int): Unit =
    df.withColumn("_z", zCol(x, y, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order locality digest: events keyed by (user_id mod 1024,
    // event_id mod 1024) — both dims on the SAME 10-bit scale, which
    // is z-order's one precondition (unequal bit widths leave the
    // narrow dim's bits all in the curve's low positions, so bands
    // stop bounding it; LayoutSpec demonstrates the fix is dimension
    // normalization). The curve value is cut into 16 equal-width
    // bands (a pure map — no global sort in the digest) and each band
    // reports its bounding box in BOTH dimensions: every band's box
    // is a small fraction of the global domain in x AND y
    // simultaneously — the property single-column clustering cannot
    // deliver and the reason a two-column predicate over a z-laid-out
    // table prunes to a few bands. Hash-exact: interleaving is
    // integer math.
    "zo_locality" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // dimension normalization: scale each key onto the shared
      // 10-bit curve domain (ONE bounded driver action for the maxes
      // — the qvecs precedent; integer div thereafter, engine-exact)
      val r = ev.agg(max(col("user_id")).cast("long"),
        max(col("event_id")).cast("long")).head()
      val (maxU, maxE) = (r.getLong(0) + 1, r.getLong(1) + 1)
      val x = expr(s"CAST(user_id AS BIGINT) * 1024 div $maxU")
      val y = expr(s"CAST(event_id AS BIGINT) * 1024 div $maxE")
      ev.withColumn("z", zCol(x, y, 10))
        .withColumn("band", expr("z div 65536"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          min(x).as("min_x"), max(x).as("max_x"),
          min(y).as("min_y"), max(y).as("max_y"))
        .orderBy("band")
    })
  )

  val oracles: Map[String, String] = Map(
    "zo_locality" -> {
      val z = zSql("xn", "yn", 10)
      s"""WITH m AS (
         |  SELECT CAST(max(user_id) AS BIGINT) + 1 AS mu,
         |         CAST(max(event_id) AS BIGINT) + 1 AS me FROM events),
         |norm AS (
         |  SELECT CAST(user_id AS BIGINT) * 1024 // m.mu AS xn,
         |         CAST(event_id AS BIGINT) * 1024 // m.me AS yn
         |  FROM events, m)
         |SELECT $z // 65536 AS band, count(*) AS n,
         |  min(xn) AS min_x, max(xn) AS max_x,
         |  min(yn) AS min_y, max(yn) AS max_y
         |FROM norm GROUP BY band ORDER BY band""".stripMargin
    }
  )
}
