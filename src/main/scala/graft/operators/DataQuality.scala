package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality validation — the Deequ/Great-Expectations
  * pass a training-data pipeline runs before anything else touches a
  * drop: declare constraints, compute every metric, emit one
  * pass/fail report row per constraint.
  *
  * Spark-first design (the Deequ trick): ALL row-local constraints —
  * completeness, domain/range/pattern compliance, table size — compile
  * into ONE aggregation pass over the table (exact integer counters,
  * partial-aggregated map-side, one 1-row reduce; each metric is a
  * single integer/integer double division, bit-exact cross-engine).
  * Uniqueness rides the same pass as count(DISTINCT col) (Catalyst
  * plans the Expand alongside the plain counters). Referential checks
  * are the one constraint class that genuinely needs a second
  * relation: each runs one equi-join against the DISTINCT reference
  * keys — dimension-sized, so AQE broadcasts it (no hint: a
  * corpus-derived reference must stay shuffle-joinable at 100 TB).
  *
  * At scale: one fact-table scan for the whole row-local suite
  * regardless of how many constraints are declared; driver state =
  * one row of counters. This is why the report is counters-and-
  * fractions, not digests — additive metrics merge across partitions
  * for free.
  *
  * Reference behavior absorbed: the ad-hoc validation scattered through
  * the reference's ingest path (file-type/size gates in
  * upload-processing, pydantic field presence) generalized into the
  * declarative suite shape.
  */
object DataQuality {

  sealed trait Check { def name: String; def threshold: Double }
  /** fraction of rows with `column` non-null ≥ threshold. */
  final case class Completeness(name: String, column: String,
                                threshold: Double) extends Check
  /** count(DISTINCT columns) / count(*) ≥ threshold (1.0 = key). */
  final case class Uniqueness(name: String, columns: Seq[String],
                              threshold: Double) extends Check
  /** fraction of rows satisfying `predicate` ≥ threshold. */
  final case class Compliance(name: String, predicate: Column,
                              threshold: Double) extends Check
  /** table row count ≥ threshold (metric = n_rows as double). */
  final case class SizeAtLeast(name: String, threshold: Double) extends Check
  /** fraction of rows whose `column` appears in ref[refColumn]
    * ≥ threshold (nulls count as non-matching — an FK must resolve). */
  final case class Referential(name: String, column: String,
                               ref: DataFrame, refColumn: String,
                               threshold: Double) extends Check

  /** Run the suite; returns one row per check:
    * (check, kind, n_rows, metric, threshold, passed). */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowLocal = checks.filter(!_.isInstanceOf[Referential])
    val refs = checks.collect { case r: Referential => r }

    // -- pass 1: every row-local metric as a named counter ------------
    val counters: Seq[Column] = rowLocal.map {
      case Completeness(n, c, _) =>
        sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"c_$n")
      case Compliance(n, p, _) =>
        sum(when(p, 1L).otherwise(0L)).as(s"c_$n")
      case Uniqueness(n, cs, _) =>
        countDistinct(col(cs.head), cs.tail.map(col): _*).as(s"c_$n")
      case SizeAtLeast(n, _) => count(lit(1)).as(s"c_$n")
      case r: Referential =>
        throw new IllegalStateException(s"unreachable: ${r.name}")
    }
    val allAggs = count(lit(1)).as("n_rows") +: counters
    val onePass = df.agg(allAggs.head, allAggs.tail: _*)

    // unstack the 1-row counter frame into report rows (1 row in,
    // |checks| out — pure expression work)
    val reportStructs = array(rowLocal.map { c =>
      val kind = c.getClass.getSimpleName
      val metric = c match {
        case _: SizeAtLeast => col(s"c_${c.name}").cast("double")
        case _ => col(s"c_${c.name}").cast("double") /
          col("n_rows").cast("double")
      }
      struct(lit(c.name).as("check"), lit(kind).as("kind"),
        col("n_rows").as("n_rows"), metric.as("metric"),
        lit(c.threshold).as("threshold"),
        (metric >= lit(c.threshold)).cast("long").as("passed"))
    }: _*)
    val local = onePass.select(explode(reportStructs).as("r")).select("r.*")

    // -- referential checks: one join per declared FK -----------------
    val refReports = refs.map { case Referential(n, c, ref, rc, thr) =>
      val keys = ref.select(col(rc).as("__ref_key")).distinct()
      df.select(col(c).as("__fk"))
        .join(keys, col("__fk") === col("__ref_key"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__ref_key").isNotNull, 1L).otherwise(0L)).as("hit"))
        .select(lit(n).as("check"), lit("Referential").as("kind"),
          col("n_rows"),
          (col("hit").cast("double") / col("n_rows").cast("double")).as("metric"),
          lit(thr).as("threshold"),
          ((col("hit").cast("double") / col("n_rows").cast("double")) >=
            lit(thr)).cast("long").as("passed"))
    }
    refReports.foldLeft(local)(_ unionByName _).orderBy("check")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DQ — the validation suite a pipeline would run on every arriving
    // orders drop: presence, key uniqueness, domain/range/pattern
    // compliance, freshness window, and FK resolution against the
    // customer dimension. 9 constraints = 1 fact scan + 1 AQE join.
    "dq_validate" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      validate(orders, Seq(
        SizeAtLeast("size_min_rows", 100.0),
        Completeness("complete_custkey", "o_custkey", 1.0),
        Completeness("complete_orderdate", "o_orderdate", 1.0),
        Uniqueness("unique_orderkey", Seq("o_orderkey"), 1.0),
        Compliance("domain_status",
          col("o_orderstatus").isin("O", "F", "P"), 1.0),
        Compliance("range_price_positive", col("o_totalprice") > 0, 1.0),
        Compliance("pattern_priority",
          col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"), 1.0),
        Compliance("range_orderdate",
          col("o_orderdate").between("1995-01-01", "2001-12-31"), 1.0),
        Referential("fk_custkey_resolves", "o_custkey",
          customer, "c_custkey", 1.0)))
    })
  )

  val oracles: Map[String, String] = Map(
    "dq_validate" ->
      """WITH base AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS c_custkey,
        |    sum(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END) AS c_odate,
        |    count(DISTINCT o_orderkey) AS c_uniq,
        |    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS c_status,
        |    sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c_price,
        |    sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS c_prio,
        |    sum(CASE WHEN o_orderdate BETWEEN DATE '1995-01-01' AND DATE '2001-12-31'
        |             THEN 1 ELSE 0 END) AS c_drange
        |  FROM orders),
        |fk AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS hit
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |rep AS (
        |  SELECT 'size_min_rows' AS "check", 'SizeAtLeast' AS kind, n_rows,
        |    CAST(n_rows AS DOUBLE) AS metric, 100.0 AS threshold FROM base
        |  UNION ALL SELECT 'complete_custkey', 'Completeness', n_rows,
        |    CAST(c_custkey AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'complete_orderdate', 'Completeness', n_rows,
        |    CAST(c_odate AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'unique_orderkey', 'Uniqueness', n_rows,
        |    CAST(c_uniq AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'domain_status', 'Compliance', n_rows,
        |    CAST(c_status AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'range_price_positive', 'Compliance', n_rows,
        |    CAST(c_price AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'pattern_priority', 'Compliance', n_rows,
        |    CAST(c_prio AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'range_orderdate', 'Compliance', n_rows,
        |    CAST(c_drange AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM base
        |  UNION ALL SELECT 'fk_custkey_resolves', 'Referential', n_rows,
        |    CAST(hit AS DOUBLE) / CAST(n_rows AS DOUBLE), 1.0 FROM fk)
        |SELECT "check", kind, n_rows, metric, threshold,
        |  CAST(CASE WHEN metric >= threshold THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM rep ORDER BY "check"""".stripMargin
  )
}
