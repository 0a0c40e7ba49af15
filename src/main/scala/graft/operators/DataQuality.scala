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
    }),

    // DQ — distribution-drift detector (the PSI-shaped check a feature
    // pipeline runs between a reference window and a fresh window):
    // per event_type, quartile edges from the REFERENCE slice (exact
    // order statistics over partitioned windows — the a10 shape, never
    // a global window), both slices histogrammed against those edges,
    // drift = L1 distance between the two bucket distributions. The
    // metric is computed integer-EXACT via cross-multiplication
    // (|c_a·n_b − c_b·n_a| summed, ONE double divide by n_a·n_b at the
    // end) — the reason it is L1 and not PSI proper is that ln() is
    // libm-dependent and would break cross-engine bit-equality, while
    // L1 ranks drifted features identically. Edges/counts relations
    // are domain-bounded (one row per event type) — broadcast like
    // a10's group counts.
    "dq_histogram_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"),
          dayofmonth(col("ts")).as("dom"))
      val sliceA = ev.filter(col("dom") <= 15)
      val sliceB = ev.filter(col("dom") > 15)
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      val na = sliceA.groupBy("event_type").agg(count(lit(1)).as("n_a"))
      val nb = sliceB.groupBy("event_type").agg(count(lit(1)).as("n_b"))
      val edges = sliceA.withColumn("rn", row_number().over(w))
        .join(broadcast(na), Seq("event_type"))
        .groupBy("event_type")
        .agg(max(when(col("rn") === expr("(1 * n_a) div 4"), col("value"))).as("e1"),
          max(when(col("rn") === expr("(2 * n_a) div 4"), col("value"))).as("e2"),
          max(when(col("rn") === expr("(3 * n_a) div 4"), col("value"))).as("e3"))
      def bucketed(df: DataFrame, cName: String): DataFrame = df
        .join(broadcast(edges), Seq("event_type"))
        .withColumn("bkt",
          when(col("value") <= col("e1"), 0L)
            .when(col("value") <= col("e2"), 1L)
            .when(col("value") <= col("e3"), 2L).otherwise(3L))
        .groupBy("event_type", "bkt").agg(count(lit(1)).as(cName))
      bucketed(sliceA, "c_a")
        .join(bucketed(sliceB, "c_b"), Seq("event_type", "bkt"), "full_outer")
        .na.fill(0L, Seq("c_a", "c_b"))
        .join(broadcast(na), Seq("event_type"))
        .join(broadcast(nb), Seq("event_type"))
        .groupBy("event_type")
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          sum(abs(col("c_a") * col("n_b") - col("c_b") * col("n_a"))).as("xnum"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          (col("xnum").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("drift_l1"))
        .orderBy("event_type")
    }),

    // EMBEDDING-DISTRIBUTION drift between corpus slices — the vector
    // twin of dq_histogram_drift and the check a training pipeline
    // runs between crawl snapshots before mixing them (a centroid
    // that moved means the new drop's content distribution shifted:
    // different domains, languages, or an upstream embedder change).
    // Slices are ingestion-order quarters (vec_id * 4 div (max+1) —
    // integer arithmetic both engines replay); per slice ONE grouped
    // agg computes the centroid with the vq_mean_pool ordered-reduce
    // (elementwise sums fold in vec_id order — bit-exact cross-
    // engine), then consecutive slices compare by centroid cosine and
    // L2 gap (index-ordered left folds; sqrt/div correctly rounded).
    // Scale shape: 4 groups, no pairwise vector work anywhere; the
    // vec_id-ordered fold exists for the oracle's bit-equality — the
    // production variant is a plain elementwise sum agg (commutative,
    // map-side partial, one 64-double vector per partition per slice)
    // at the cost of fp-association determinism.
    "dq_embedding_drift" -> ((s, d) => {
      val zero = array((0 until 64).map(_ => lit(0.0)): _*)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val mx = e.agg(max("vec_id")).head().getLong(0)
      val cent = e
        .withColumn("slice", expr(s"(vec_id * 4) div ${mx + 1}"))
        .groupBy("slice")
        .agg(count(lit(1)).as("n_vecs"),
          aggregate(
            array_sort(collect_list(struct(col("vec_id"), col("emb")))),
            zero,
            (acc, x) => zip_with(acc, x.getField("emb"), (a, b) => a + b))
            .as("sumv"))
        .withColumn("cent",
          transform(col("sumv"), v => v / col("n_vecs").cast("double")))
      val a = cent.select(col("slice").as("slice_from"),
        col("n_vecs").as("n_from"), col("cent").as("ca"))
      val b = cent.select(col("slice").as("slice_to"),
        col("n_vecs").as("n_to"), col("cent").as("cb"))
      a.join(b, col("slice_to") === col("slice_from") + 1)
        .withColumn("dot", aggregate(
          zip_with(col("ca"), col("cb"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v))
        .withColumn("na", sqrt(aggregate(col("ca"), lit(0.0),
          (acc, v) => acc + v * v)))
        .withColumn("nb", sqrt(aggregate(col("cb"), lit(0.0),
          (acc, v) => acc + v * v)))
        .withColumn("l2_gap", sqrt(aggregate(
          zip_with(col("ca"), col("cb"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)))
        .select(col("slice_from"), col("slice_to"), col("n_from"), col("n_to"),
          (col("dot") / (col("na") * col("nb"))).as("cos_centroid"),
          col("l2_gap"))
        .orderBy("slice_from")
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
        |FROM rep ORDER BY "check"""".stripMargin,
    // drift replayed: same reference-slice quartile edges (partitioned
    // order statistics), same bucket rule, same cross-multiplied L1.
    "dq_histogram_drift" ->
      """WITH ev AS (
        |  SELECT event_type, value, event_id, day(ts) AS dom FROM events),
        |sa AS (SELECT * FROM ev WHERE dom <= 15),
        |sb AS (SELECT * FROM ev WHERE dom > 15),
        |na AS (SELECT event_type, count(*) AS n_a FROM sa GROUP BY 1),
        |nb AS (SELECT event_type, count(*) AS n_b FROM sb GROUP BY 1),
        |ar AS (
        |  SELECT sa.event_type, value,
        |    row_number() OVER (PARTITION BY sa.event_type
        |      ORDER BY value, event_id) AS rn, n_a
        |  FROM sa JOIN na USING (event_type)),
        |edges AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (1 * n_a) // 4 THEN value END) AS e1,
        |    max(CASE WHEN rn = (2 * n_a) // 4 THEN value END) AS e2,
        |    max(CASE WHEN rn = (3 * n_a) // 4 THEN value END) AS e3
        |  FROM ar GROUP BY 1),
        |ha AS (
        |  SELECT s.event_type,
        |    CASE WHEN value <= e1 THEN 0 WHEN value <= e2 THEN 1
        |         WHEN value <= e3 THEN 2 ELSE 3 END AS bkt,
        |    count(*) AS c_a
        |  FROM sa s JOIN edges USING (event_type) GROUP BY 1, 2),
        |hb AS (
        |  SELECT s.event_type,
        |    CASE WHEN value <= e1 THEN 0 WHEN value <= e2 THEN 1
        |         WHEN value <= e3 THEN 2 ELSE 3 END AS bkt,
        |    count(*) AS c_b
        |  FROM sb s JOIN edges USING (event_type) GROUP BY 1, 2),
        |hh AS (
        |  SELECT COALESCE(ha.event_type, hb.event_type) AS event_type,
        |    coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
        |  FROM ha FULL OUTER JOIN hb
        |    ON ha.event_type = hb.event_type AND ha.bkt = hb.bkt)
        |SELECT h.event_type, max(n_a) AS n_a, max(n_b) AS n_b,
        |  CAST(CAST(sum(abs(c_a * n_b - c_b * n_a)) AS BIGINT) AS DOUBLE)
        |    / CAST(max(n_a) * max(n_b) AS DOUBLE) AS drift_l1
        |FROM hh h JOIN na USING (event_type) JOIN nb USING (event_type)
        |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin,
    // embedding drift replayed: same slice arithmetic, same vec_id-
    // ordered per-dimension fold (list(... ORDER BY vec_id) then a
    // left reduce — identical fp sequence), same cosine/L2 formulas.
    "dq_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |m AS (SELECT max(vec_id) AS mx FROM e),
        |sl AS (
        |  SELECT vec_id * 4 // (mx + 1) AS slice, vec_id, emb FROM e, m),
        |g AS (
        |  SELECT slice, count(*)::BIGINT AS n_vecs,
        |    list(emb ORDER BY vec_id) AS rows_
        |  FROM sl GROUP BY 1),
        |c AS (
        |  SELECT slice, n_vecs,
        |    list_transform(range(1, 65),
        |      j -> list_reduce(list_transform(rows_, v -> v[j]), (x, y) -> x + y)
        |           / CAST(n_vecs AS DOUBLE)) AS cent
        |  FROM g),
        |p AS (
        |  SELECT a.slice AS slice_from, b.slice AS slice_to,
        |    a.n_vecs AS n_from, b.n_vecs AS n_to,
        |    list_reduce(list_transform(range(1, 65),
        |      j -> a.cent[j] * b.cent[j]), (x, y) -> x + y) AS dot,
        |    sqrt(list_reduce(list_transform(a.cent, v -> v * v),
        |      (x, y) -> x + y)) AS na,
        |    sqrt(list_reduce(list_transform(b.cent, v -> v * v),
        |      (x, y) -> x + y)) AS nb,
        |    sqrt(list_reduce(list_transform(range(1, 65),
        |      j -> (a.cent[j] - b.cent[j]) * (a.cent[j] - b.cent[j])),
        |      (x, y) -> x + y)) AS l2_gap
        |  FROM c a JOIN c b ON b.slice = a.slice + 1)
        |SELECT slice_from, slice_to, n_from, n_to,
        |  dot / (na * nb) AS cos_centroid, l2_gap
        |FROM p ORDER BY slice_from""".stripMargin
  )
}
