package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator surface of the reference (SURVEY.md §2.2 filters/
  * projections P1-P9, §2.4 aggregations A1-A8, §2.5 joins J1-J8, §2.6
  * windows W1-W4, §2.7 set ops D1-D6), expressed over the driver's
  * TPC-H-ish tables with DuckDB-oracle parity.
  *
  * Exactness rules used throughout (so driver hash-compare passes):
  *  - money math in decimal(18,2) end-to-end (shuffle-order-independent,
  *    identical in Spark and DuckDB), final cast to double;
  *  - averages as exact-decimal sum / count in one IEEE double divide;
  *  - every result has a total deterministic ORDER BY (unique tiebreak);
  *  - timestamps are never emitted raw (ns-vs-us precision) — always
  *    `date_format`/`strftime` strings.
  *
  * Scale notes: group-bys here are partial-aggregated map-side by
  * Catalyst; dimension joins (nation/region/customer) are broadcast —
  * at 100 TB only the fact-table scan grows, the plans keep a single
  * shuffle per agg and zero shuffle on the broadcast joins.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 — conjunctive filter builder (crud_documents.py:24-67 semantics:
    // IN-list, case-insensitive contains, range), pushed to parquet scan.
    "p1_filter_conjunctive" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("lang").isin("en", "zh") &&
          lower(col("text")).contains("spark") &&
          col("n_chars").between(100, 2000))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // P2 — pagination + sort with whitelisted sort field (crud_documents.py:208-230).
    "p2_pagination_sort" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(100).limit(50)
    }),

    // P3 — count with filter (crud_documents.py:161-182).
    "p3_count_filter" -> ((s, d) => {
      Tables.documents(s, d).filter(col("lang") === "en")
        .agg(count(lit(1)).as("n"))
    }),

    // P4 — batch get-by-ids ($in point lookups, crud_documents.py:319-357).
    "p4_get_by_ids" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey").isin(1L, 7L, 42L, 1000L, 4999L))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P6 — log filter: level eq + time range + contains, newest first (crud_logs.py:23-113).
    "p6_log_filter" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "error" &&
          col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-05 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("value"))
        .orderBy(col("event_id").desc)
        .limit(100)
    }),

    // T6-ish — JSON field extraction from an open-schema props column
    // (metadata Dict escape hatch, SURVEY §1.1).
    "t6_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("k").asc)
        .limit(20)
    }),

    // A1 — dashboard system stats: conditional status counts + total size (crud_dashboard.py:17-65).
    "a1_system_stats" -> ((s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
    }),

    // A2 — per-group stats: count + exact avg (qa_analytics_service.py:134-155).
    "a2_group_stats" -> ((s, d) => {
      Tables.events(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
        .withColumn("avg_value", col("sum_value") / col("n").cast("double"))
        .orderBy("event_type")
    }),

    // A3 — overall conditional stats ($cond success-rate, qa_analytics_service.py:158-212).
    "a3_conditional_stats" -> ((s, d) => {
      Tables.events(s, d).agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
        .withColumn("purchase_rate", col("n_purchase").cast("double") / col("n").cast("double"))
    }),

    // A4 — daily trend: group by day string, ordered (qa_analytics_service.py:246-264).
    "a4_daily_trend" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("day")
    }),

    // A16 — cohort retention (beyond-reference analytics op): users
    // cohorted by first-activity week, each retention cell =
    // distinct users from cohort c active in week c+k — the standard
    // product-analytics matrix. Two shuffles: the per-user min (user
    // key) and the cell aggregation (cohort, offset); the self-join
    // back to events reuses the user_id partitioning from the first.
    // Both date_truncs land on Monday in Spark and DuckDB; offsets
    // are exact multiples of 7 days, so the integer division is safe.
    "a16_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val firstWk = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      ev.join(firstWk, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
        .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // A5 — keyword frequency: explode + count + top-k (clustering_service.py:793-865).
    "a5_keyword_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    // A6 — cluster size distribution (clustering_service.py:436-453).
    "a6_label_sizes" -> ((s, d) => {
      Tables.embeddings(s, d).groupBy("label").agg(count(lit(1)).as("n"))
        .orderBy("label")
    }),

    // A7 — clustering stats rollup: (level, cluster) + totals (apis/v1/clustering.py:591-663).
    "a7_rollup" -> ((s, d) => {
      Tables.documents(s, d)
        .rollup("lang", "source")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("n"))
        .orderBy("lang", "source")
    }),

    // J1 — enrich ids with dimension data via broadcast joins (crud_documents.py:319-357
    // batch-$in fetch). Only the DOMAIN-BOUNDED dims (nation=25, region=5 rows at
    // any scale) carry a broadcast hint; customer grows with the corpus, so its
    // join is left to AQE — broadcast at small SF, shuffle join at 100 TB.
    "j1_join_enrich" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("r_name")
    }),

    // J2 — semi join: restrict to candidate set (enhanced_search_service.py:170-179).
    "j2_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // J6 — anti join: duplicate-import / not-exists check (email_document_processor.py:134-160).
    "j6_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J7 — vector-coverage reconciliation: the reference's
    // vector_status lifecycle (which docs have summary vectors, which
    // are missing) as a left-join + conditional agg per source.
    "j7_vector_reconcile" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sums = Tables.embeddings(s, d).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("emb_doc_id")).distinct()
      docs.join(sums, col("doc_id") === col("emb_doc_id"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("emb_doc_id").isNotNull, 1L).otherwise(0L)).as("n_vectorized"),
          sum(when(col("emb_doc_id").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy("source")
    }),

    // J3 — full-outer merge of two per-key aggregates (the RRF union shape,
    // enhanced_search_service.py:421-456).
    "j3_full_outer" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("open_spend"))
      val fin = o.filter(col("o_orderstatus") === "F").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("fin_spend"))
      open.join(fin, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("open_spend"), lit(0.0)).as("open_spend"),
          coalesce(col("fin_spend"), lit(0.0)).as("fin_spend"))
        .orderBy("o_custkey")
    }),

    // W1 — global ranking (RRF rank assignment, enhanced_search_service.py:403-419).
    // Top-k first (TakeOrderedAndProject — per-partition top-k, no full
    // sort), THEN rank the k survivors: the global window only ever
    // sees k rows, so the single-partition window is O(k) at any scale.
    "w1_rank" -> ((s, d) => {
      Tables.supplier(s, d)
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
        .limit(50)
        .withColumn("rnk", row_number().over(
          graft.functions.BoundedWindow.orderBy(col("s_suppkey"),
            col("s_acctbal").desc, col("s_suppkey").asc)))
        .select("rnk", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("rnk")
    }),

    // W2 — best-row-per-group dedup (keep-max per document, V7/W2 sites).
    "w2_top_per_group" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // W3 — last-N per key ($slice -n on messages, crud_conversations.py:181-211).
    "w3_last_n" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
        .orderBy("user_id", "rn")
    }),

    // W4 — top-k (TakeOrderedAndProject; dashboard recent-activity shape).
    "w4_topk" -> ((s, d) => {
      Tables.part(s, d)
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    }),

    // A8 — eval aggregates: mean/max/min/stddev per group
    // (evaluate_full_qa_system.py:297-310). Stddev derived from exact
    // decimal sums so both engines compute identical doubles.
    "a8_eval_stats" -> ((s, d) => {
      Tables.events(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("s"),
        sum(dec(col("value")) * dec(col("value"))).cast("double").as("ssq"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"))
        .withColumn("avg_value", col("s") / col("n").cast("double"))
        .withColumn("std_value",
          sqrt((col("n").cast("double") * col("ssq") - col("s") * col("s")) /
            (col("n").cast("double") * (col("n").cast("double") - 1.0))))
        .select("event_type", "n", "avg_value", "max_value", "min_value", "std_value")
        .orderBy("event_type")
    }),

    // D5 — word-set overlap between paired documents (the diversity
    // primitive, search_strategy.py:61-66).
    "d5_word_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.select(col("doc_id").as("id_a"), split(col("text"), " ").as("toks_a"))
      val b = docs.select(col("doc_id").as("id_b"), split(col("text"), " ").as("toks_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .filter(col("id_a") < 50)
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("long").as("overlap"))
        .orderBy("id_a")
    }),

    // P11 — tags-overlap filter: MongoDB `$in` on an array column is
    // set-INTERSECTION (arrays_overlap), not contains-all
    // (crud_documents.py:24-67 tags_include semantics). Tokens stand in
    // for the tags array on the synthetic table.
    "p11_tags_overlap" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(arrays_overlap(split(col("text"), " "),
          array(lit("spark"), lit("catalyst"))))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // A11 — pivot: per-day event counts spread across one column per
    // event type (explicit value list keeps the schema deterministic;
    // Spark's inferred pivot would scan for distinct values first).
    "a11_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    }),

    // A12 — cube over (lang, source): all four grouping combinations
    // in one pass (the dashboards' "totals at every margin" shape).
    "a12_cube" -> ((s, d) => {
      Tables.documents(s, d)
        .cube("lang", "source")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("n"))
        .orderBy("lang", "source")
    }),

    // A10 — exact per-group median without interpolation drift: pick
    // the middle row(s) by rank (total order: value, id) and average
    // the two middles as (min+max)/2 — a single deterministic IEEE op
    // sequence, identical in both engines. Interpolated percentile()
    // implementations differ across engines; rank selection doesn't.
    "a10_median_exact" -> ((s, d) => {
      val byVal = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      // Group counts come from a groupBy + broadcast join (5 tiny
      // rows), NOT an unbounded-frame count window — the window form
      // forced a second full pass over the sorted partition (round-3
      // slowest-query list).
      val ev = Tables.events(s, d)
      val counts = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      ev
        .withColumn("rn", row_number().over(byVal))
        .join(broadcast(counts), Seq("event_type"))
        .filter(col("rn") === expr("(cnt + 1) div 2") || col("rn") === expr("cnt div 2 + 1"))
        .groupBy("event_type")
        .agg(((min(col("value")) + max(col("value"))) / 2.0).as("median"),
          max(col("cnt")).as("n"))
        .orderBy("event_type")
    }),

    // A26 — robust anomaly flags on the daily event series (beyond-
    // reference analytics op): median/MAD z-scores (Iglewicz–Hoaglin),
    // the outlier rule monitoring dashboards use because mean/stddev
    // are themselves corrupted by the outliers they hunt. Shape for
    // scale: ONE shuffle (the daily partial-agg over events); the
    // median and MAD then live on the |days|-row relation, which is
    // bounded — collected into one sorted array inside a single agg
    // row, never a global window over event rows. The two medians are
    // midpoint-of-middle-elements over exact integers; z is one double
    // divide; mad=0 (a constant series) yields NULL z by contract.
    "a26_anomaly_robust" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val mid1 = expr("cast((cnt + 1) div 2 as int)")
      val mid2 = expr("cast(cnt div 2 + 1 as int)")
      daily
        .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("rows"),
          sort_array(collect_list(col("n"))).as("ns"),
          count(lit(1)).as("cnt"))
        .withColumn("med",
          (element_at(col("ns"), mid1) + element_at(col("ns"), mid2)) / 2.0)
        .withColumn("adevs",
          sort_array(transform(col("ns"), x => abs(x - col("med")))))
        .withColumn("mad",
          (element_at(col("adevs"), mid1) + element_at(col("adevs"), mid2)) / 2.0)
        .select(explode(col("rows")).as("r"), col("med"), col("mad"))
        .select(col("r.day").as("day"), col("r.n").as("n"),
          col("med"), col("mad"),
          when(col("mad") === 0.0, lit(null).cast("double"))
            .otherwise((col("r.n") - col("med")) / (lit(1.4826) * col("mad")))
            .as("z"),
          when(col("mad") === 0.0, lit(0L))
            .otherwise((abs(col("r.n") - col("med")) >
              lit(3.0) * lit(1.4826) * col("mad")).cast("long"))
            .as("is_anomaly"))
        .orderBy("day")
    }),

    // A15 — explicit GROUPING SETS (the general form behind A7's
    // rollup and A12's cube): per-lang totals, per-source totals, and
    // the grand total in ONE pass — Spark expands the sets map-side,
    // one shuffle. grouping_id disambiguates the margins.
    "a15_grouping_sets" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("g_docs")
      s.sql("""SELECT coalesce(lang, 'ALL') AS lang,
               |       coalesce(source, 'ALL') AS source,
               |       count(*) AS n,
               |       CAST(grouping_id(lang, source) AS BIGINT) AS gid
               |FROM g_docs
               |GROUP BY GROUPING SETS ((lang), (source), ())
               |ORDER BY gid, lang, source""".stripMargin)
    }),

    // A13 — HLL sketch distinct count (approx_count_distinct, rsd 1%):
    // THE approximate-aggregation workhorse at 100 TB, where exact
    // count-distinct's two-phase expand shuffle is the bottleneck.
    // Sketch values are engine-specific, so the oracle checks the
    // sketch's CONTRACT instead: the exact count (computed by both
    // engines) plus a within-5%-of-exact flag the oracle pins to TRUE
    // — if Spark's HLL ever drifts past its rsd bound, the gate fails.
    "a13_sketch_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .withColumn("within_5pct",
          abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users").cast("double") <= 0.05)
        .select("event_type", "exact_users", "within_5pct")
        .orderBy("event_type")),

    // A14 — approximate quantile sketch (percentile_approx, accuracy
    // 10k): like A13, the sketch value itself is engine-specific, so
    // the oracle pins the CONTRACT — the approx median must land
    // between the exact rank-selected p45 and p55 values (rank error
    // bound n/accuracy ⇒ ±2 ranks at sf0.1, far inside the window).
    // At 100 TB the sketch is mergeable map-side state vs the exact
    // form's full sort-shuffle per group.
    "a14_approx_quantile" -> ((s, d) => {
      val byVal = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      val ranked = Tables.events(s, d)
        .withColumn("rn", row_number().over(byVal))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      val bounds = ranked
        .filter(col("rn") === expr("greatest(1L, (cnt * 45) div 100)") ||
          col("rn") === expr("greatest(1L, (cnt * 55) div 100)"))
        .groupBy("event_type").agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      Tables.events(s, d).groupBy("event_type")
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("apx"))
        .join(bounds, "event_type")
        .select(col("event_type"), col("lo"), col("hi"),
          (col("apx") >= col("lo") && col("apx") <= col("hi")).as("within_bounds"))
        .orderBy("event_type")
    }),

    // A9 — histogram binning: fixed-width buckets over a value column
    // (floor division is IEEE-identical in both engines; min/max raw
    // doubles are order-independent). One partial-agg shuffle at scale.
    "a9_histogram" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")
    }),

    // A27 — APPROXIMATE QUERY PROCESSING by deterministic hash
    // sampling (the BlinkDB/uniform-sample move): membership = first
    // md5 hex digit of the row key is '0' (an exact 1/16 rate, pushed
    // into the scan like p10), estimates = sample aggregates × 16,
    // reported NEXT TO the exact answers with the realized relative
    // error — the operator a 100 TB dashboard runs when a 6 % error
    // bar is worth a 16× scan reduction. All arithmetic is integer ×
    // integer or decimal × integer until one final double cast, so
    // both engines agree bit-for-bit; the error column is itself part
    // of the gate (a sampler whose rate or scale-up drifts hash-fails).
    "a27_sample_estimate" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val li = Tables.lineitem(s, d)
      val keyHex = substring(md5(concat_ws(":",
        col("l_orderkey"), col("l_linenumber"))), 1, 1)
      val exact = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_exact"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("qty_exact"))
      val samp = li.filter(keyHex === "0")
        .groupBy("l_returnflag")
        .agg((count(lit(1)) * 16).as("n_est"),
          (sum(col("l_quantity").cast(DecimalType(18, 2))) * 16).cast("double")
            .as("qty_est"))
      exact.join(samp, Seq("l_returnflag"), "left")
        .na.fill(0L, Seq("n_est")).na.fill(0.0, Seq("qty_est"))
        .withColumn("rel_err_n",
          abs(col("n_est") - col("n_exact")).cast("double") /
            col("n_exact").cast("double"))
        .select("l_returnflag", "n_exact", "n_est", "qty_exact", "qty_est",
          "rel_err_n")
        .orderBy("l_returnflag")
    }),

    // P10 — deterministic hash-based stratified sample: membership by
    // md5(key) prefix, so the sample is reproducible across engines,
    // runs, and cluster sizes (unlike rand()-based sampleBy), and the
    // filter pushes into the scan. ~3/16 rate here.
    "p10_stratified_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }),

    // W6 — top-k per group via the typed TopKAggregator: map-side
    // partial top-k means the shuffle carries ≤k rows per (group,
    // partition) instead of every row (the window form sort-shuffles
    // the whole table). Same result as W2's window, checked by oracle.
    "w6_topk_agg" -> ((s, d) => {
      import s.implicits._
      val typed = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => graft.functions.ScoredRow(t._2, t._3))
        .agg(graft.functions.TopK.topK(3).name("top"))
      typed.toDF("o_custkey", "top")
        .select(col("o_custkey"), explode(col("top")).as("r"))
        .select(col("o_custkey"), col("r.id").as("o_orderkey"),
          col("r.score").as("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W5 — per-key running total (cumulative decimal sum, cast to
    // double per row): the streaming-dashboard cumulative shape.
    "w5_running_total" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("cum_value",
          sum(dec(col("value"))).over(
            Window.partitionBy("user_id").orderBy("event_id")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select("user_id", "event_id", "cum_value")
        .orderBy("user_id", "event_id")
    }),

    // W7 — distribution window functions: ntile quartiles,
    // percent_rank, cume_dist, and a lag delta, per event_type over
    // a 3-user slice. percent_rank = (rank-1)/(n-1) and cume_dist =
    // rows≤cur/n are single int/int double divisions — identical in
    // both engines; the lag delta is one double subtraction.
    "w7_distribution_ranks" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, d).filter(col("user_id") < 3)
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"))
        .orderBy("event_type", "event_id")
    }),

    // W9 — GAPS-AND-ISLANDS streak consolidation (the classic
    // engagement-analytics shape SQL folklore names "islands": merge
    // each user's consecutive ACTIVE DAYS into runs using the
    // day − row_number() anchor — consecutive days share an anchor,
    // any gap starts a new one). Per user: streak count, longest
    // streak, total active days. One distinct + one partitioned
    // window + two grouped aggs, all partitioned by user — nothing
    // global, integer/date-exact in both engines.
    "w9_streaks" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("rn", row_number().over(w))
        .withColumn("anchor", expr("date_sub(day, rn)"))
        .groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
          sum(col("len")).as("active_days"))
        .orderBy("user_id")
    }),

    // D1 — union + distinct of two keyed result sets (RRF all_documents union).
    "d1_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 450000.0).select(col("o_custkey"))
      a.union(b).distinct().orderBy("o_custkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "p1_filter_conjunctive" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('en','zh') AND contains(lower(text), 'spark')
        |  AND n_chars BETWEEN 100 AND 2000 ORDER BY doc_id""".stripMargin,
    "p2_pagination_sort" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100""".stripMargin,
    "p3_count_filter" ->
      "SELECT count(*) AS n FROM documents WHERE lang = 'en'",
    "p4_get_by_ids" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey IN (1,7,42,1000,4999) ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p6_log_filter" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
        |FROM events
        |WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id DESC LIMIT 100""".stripMargin,
    "t6_json_extract" ->
      """SELECT json_extract_string(props, '$.k') AS k, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, k ASC LIMIT 20""".stripMargin,
    "a1_system_stats" ->
      """SELECT count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders""".stripMargin,
    "a2_group_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a3_conditional_stats" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS purchase_rate
        |FROM events""".stripMargin,
    "a4_daily_trend" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // A26 replayed: the same two order-statistic medians (midpoint of
    // the middle one/two elements) over the daily counts and the
    // absolute deviations, then the identical double z expression.
    "a26_anomaly_robust" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |st AS (SELECT n, row_number() OVER (ORDER BY n, day) AS rn,
        |              count(*) OVER () AS cnt FROM daily),
        |med AS (SELECT (min(n) + max(n)) / 2.0 AS med FROM st
        |        WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1),
        |ad AS (SELECT abs(d.n - m.med) AS adev FROM daily d, med m),
        |adr AS (SELECT adev, row_number() OVER (ORDER BY adev) AS rn,
        |               count(*) OVER () AS cnt FROM ad),
        |madc AS (SELECT (min(adev) + max(adev)) / 2.0 AS mad FROM adr
        |         WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1)
        |SELECT d.day, d.n, m.med, x.mad,
        |  CASE WHEN x.mad = 0 THEN NULL
        |       ELSE (d.n - m.med) / (1.4826 * x.mad) END AS z,
        |  CAST(CASE WHEN x.mad = 0 THEN 0
        |            WHEN abs(d.n - m.med) > 3.0 * 1.4826 * x.mad THEN 1
        |            ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM daily d, med m, madc x ORDER BY d.day""".stripMargin,
    "a16_cohort_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |fw AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
        |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
        |  CAST(datediff('day', cohort_wk, wk) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN fw USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "a5_keyword_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "a6_label_sizes" ->
      "SELECT label, count(*) AS n FROM embeddings GROUP BY label ORDER BY label",
    "a7_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source, count(*) AS n
        |FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source""".stripMargin,
    "j1_join_enrich" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j2_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j7_vector_reconcile" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN e.emb_doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vectorized,
        |  CAST(sum(CASE WHEN e.emb_doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |FROM documents d
        |LEFT JOIN (SELECT DISTINCT vec_id AS emb_doc_id FROM embeddings
        |           WHERE vec_id % 2 = 0) e
        |  ON d.doc_id = e.emb_doc_id
        |GROUP BY source ORDER BY source""".stripMargin,
    "j3_full_outer" ->
      """SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(open_spend, 0.0) AS open_spend,
        |  coalesce(fin_spend, 0.0) AS fin_spend
        |FROM (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_spend
        |      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
        |FULL OUTER JOIN (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS fin_spend
        |      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
        |USING (o_custkey) ORDER BY o_custkey""".stripMargin,
    "w1_rank" ->
      """SELECT rnk, s_suppkey, s_name, s_acctbal FROM (
        |  SELECT row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk,
        |         s_suppkey, s_name, s_acctbal FROM supplier)
        |WHERE rnk <= 50 ORDER BY rnk""".stripMargin,
    "w2_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w3_last_n" ->
      """SELECT user_id, rn, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "w4_topk" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10""".stripMargin,
    "a8_eval_stats" ->
      """SELECT event_type, n, s / CAST(n AS DOUBLE) AS avg_value, max_value, min_value,
        |  sqrt((CAST(n AS DOUBLE) * ssq - s * s) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS std_value
        |FROM (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ssq,
        |    max(value) AS max_value, min(value) AS min_value
        |  FROM events GROUP BY event_type)
        |ORDER BY event_type""".stripMargin,
    "d5_word_overlap" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(string_split(a.text, ' '), string_split(b.text, ' ')))::BIGINT AS overlap
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id < 50 ORDER BY id_a""".stripMargin,
    "p11_tags_overlap" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE list_has_any(string_split(text, ' '), ['spark', 'catalyst'])
        |ORDER BY doc_id""".stripMargin,
    "a11_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "a12_cube" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source, count(*) AS n
        |FROM documents GROUP BY CUBE(lang, source) ORDER BY lang, source""".stripMargin,
    "a10_median_exact" ->
      """SELECT event_type, (min(value) + max(value)) / 2.0 AS median, max(cnt) AS n
        |FROM (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events)
        |WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a9_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a15_grouping_sets" ->
      """SELECT coalesce(lang, 'ALL') AS lang,
        |       coalesce(source, 'ALL') AS source,
        |       count(*) AS n,
        |       CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY gid, lang, source""".stripMargin,
    "a13_sketch_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_5pct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "w7_distribution_ranks" ->
      """SELECT event_id, event_type, value,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  value - lag(value) OVER w AS delta_prev
        |FROM events
        |WHERE user_id < 3
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        |ORDER BY event_type, event_id""".stripMargin,
    // Same anchor arithmetic: day − rn·INTERVAL 1 DAY groups runs.
    "w9_streaks" ->
      """WITH ds AS (
        |  SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM ds),
        |runs AS (
        |  SELECT user_id, day - rn * INTERVAL 1 DAY AS anchor,
        |    count(*) AS len
        |  FROM r GROUP BY user_id, day - rn * INTERVAL 1 DAY)
        |SELECT user_id, count(*) AS n_streaks,
        |  CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a14_approx_quantile" ->
      """SELECT event_type, min(value) AS lo, max(value) AS hi,
        |  TRUE AS within_bounds
        |FROM (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events)
        |WHERE rn = greatest(1, (cnt * 45) // 100) OR rn = greatest(1, (cnt * 55) // 100)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "p10_stratified_sample" ->
      """SELECT source, count(*) AS n_sampled,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
        |GROUP BY source ORDER BY source""".stripMargin,
    // Same 1/16 hash membership, same ×16 scale-up, same single final
    // double cast per aggregate.
    "a27_sample_estimate" ->
      """WITH exact AS (
        |  SELECT l_returnflag, count(*) AS n_exact,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_exact
        |  FROM lineitem GROUP BY l_returnflag),
        |samp AS (
        |  SELECT l_returnflag, count(*) * 16 AS n_est,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 16 AS DOUBLE) AS qty_est
        |  FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |          CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
        |  GROUP BY l_returnflag)
        |SELECT e.l_returnflag, e.n_exact,
        |  CAST(coalesce(s.n_est, 0) AS BIGINT) AS n_est, e.qty_exact,
        |  coalesce(s.qty_est, 0.0) AS qty_est,
        |  CAST(abs(coalesce(s.n_est, 0) - e.n_exact) AS DOUBLE)
        |    / CAST(e.n_exact AS DOUBLE) AS rel_err_n
        |FROM exact e LEFT JOIN samp s ON s.l_returnflag = e.l_returnflag
        |ORDER BY e.l_returnflag""".stripMargin,
    "w6_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w5_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "d1_union_distinct" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        |ORDER BY o_custkey""".stripMargin
  )
}
