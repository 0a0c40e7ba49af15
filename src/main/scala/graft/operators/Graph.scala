package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative link-graph analytics over the document corpus — the
  * web-graph quality-signal family of a training-data pipeline
  * (Common Crawl ranks hosts by centrality before curation; FineWeb
  * filters on URL/host structure). The reference has no graph engine;
  * this is a beyond-reference operator in the same spirit as the
  * dedup connected-components pair (`Dedup.duplicateComponents`):
  * PageRank as repeated relational passes, no GraphX dependency.
  *
  * Fixture graph (deterministic in BOTH engines, so the full power
  * iteration sits under the exact DuckDB hash gate): nodes = doc_ids
  * (dense 0..N-1 in the testdata); each node gets 3 hashed out-edges
  * (16-bit md5 bucket of "pr:<id>:<salt>" mod N — the same
  * ascii-arithmetic md5 parity used by `pp_split_assign`) plus one
  * ring edge (id+1 mod N) guaranteeing outdeg ≥ 1 and connectivity;
  * self-loops dropped, duplicates deduped.
  *
  * Scale shape (per iteration): one equi-join of the rank relation
  * against the edge list on src (at 100 TB both sides pre-partitioned
  * by the join key — edges are static, so their partitioning is paid
  * once), then one shuffle keyed by dst whose payload is the
  * contribution list (collect_list is partial-aggregatable: map-side
  * concat). Rounds are a fixed constant (8), lineage truncated per
  * round with an eager localCheckpoint — the same OOM guard the
  * connected-components loops needed (PERF.md round-4 finding).
  * Double parity: contributions fold left-to-right in src order
  * (array_sort + aggregate with a 0.0 seed == DuckDB list_reduce over
  * list_prepend('0.0', list ORDER BY src)), and the damping constants
  * enter as strtod doubles in both engines.
  */
object Graph {
  private val Iters = 8
  private val Salts = 3

  /** Integer value of lowercase hex digit i (1-based) of md5 col. */
  private def hv(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** 16-bit integer from the first 4 hex digits of md5(s). */
  private def hex16(h: Column): Column =
    (((hv(h, 1) * 16 + hv(h, 2)) * 16 + hv(h, 3)) * 16 + hv(h, 4)).cast("long")

  /** Edge list (src, dst): 3 salted hash edges + the ring edge,
    * self-loops dropped, deduped. n = node count (ids dense 0..n-1). */
  private[graft] def edges(docs: DataFrame, n: Long): DataFrame = {
    val hashed = (0 until Salts).map { s =>
      val h = md5(concat(lit("pr:"), col("doc_id").cast("string"), lit(":" + s)))
      docs.select(col("doc_id").as("src"), (hex16(h) % n).as("dst"))
    }
    val ring = docs.select(col("doc_id").as("src"),
      ((col("doc_id") + 1) % n).as("dst"))
    (hashed :+ ring).reduce(_ union _)
      .where(col("src") =!= col("dst")).distinct()
  }

  /** Fixed-iteration PageRank (d = 0.85, 8 iterations) over the
    * fixture graph; returns (doc_id, pagerank, out_deg, in_deg)
    * ordered by rank. Every node has outdeg ≥ 1 (ring edge), so
    * there is no dangling mass and the teleport term keeps the ranks
    * a probability distribution (GraphSpec pins Σ = 1). */
  private[graft] def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    // Bounded driver state: one scalar (metadata-cheap on parquet).
    val n = docs.count()
    val e = edges(docs, n).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // cache the static edge relation and node-id frame so no round
    // re-scans the parquet. The r16 repartition(src) before the persist
    // is REVERTED (r17): the per-round join broadcasts the rank side
    // (plans/r17/graph_prepartition_diag.txt — BroadcastHashJoin, 12 vs
    // 11 Exchanges), so the cached hash partitioning was never used and
    // the build paid one extra up-front shuffle for nothing.
    val eo = e.join(outdeg, "src").persist()
    val docIds = docs.select(col("doc_id").as("id")).persist()

    var ranks = docIds.select(col("id"), (lit(1.0) / lit(n)).as("rank"))
    for (it <- 1 to Iters) {
      val folded = eo.join(ranks, col("src") === col("id"))
        .select(col("dst"), col("src"),
          (col("rank") / col("out_deg").cast("double")).as("contrib"))
        .groupBy("dst")
        .agg(aggregate(array_sort(collect_list(struct(col("src"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("insum"))
      ranks = docIds
        .join(folded, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(0.15) / lit(n) + lit(0.85) * coalesce(col("insum"), lit(0.0)))
            .as("rank"))
      // truncate lineage every OTHER round: one checkpoint job per two
      // iterations keeps the logical plan depth bounded at half the
      // per-round cost (the CC-loop OOM guard, amortized)
      if (it % 2 == 0 || it == Iters) ranks = ranks.localCheckpoint(true)
    }
    val indeg = e.groupBy("dst").agg(count(lit(1)).as("in_deg"))
    ranks
      .join(outdeg, col("id") === outdeg("src"))
      .join(indeg, col("id") === indeg("dst"), "left")
      .select(col("id").as("doc_id"), col("rank").as("pagerank"),
        col("out_deg"), coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .orderBy(col("pagerank").desc, col("doc_id"))
  }

  private val LpaIters = 4

  /** Synchronous label-propagation community detection (Raghavan,
    * Albert & Kumara 2007, "Near linear time algorithm to detect
    * community structures in large-scale networks") over the
    * UNDIRECTED form of the fixture link graph — the second
    * graph-as-curation-signal operator beside [[pagerank]] (host-level
    * communities group near-duplicate mirror sites; FineWeb-style
    * curation caps per-community volume the same way `pp_domain_cap`
    * caps per-domain volume).
    *
    * Determinism (the property that lets the whole iteration sit
    * under the exact DuckDB hash gate): updates are SYNCHRONOUS
    * (round t+1 reads only round-t labels — the asynchronous variant
    * of the paper is order-dependent) and the vote is all-integer:
    * new label = the neighbor label with the highest count, ties
    * broken by SMALLEST label. Fixed [[LpaIters]] rounds, no
    * convergence test — a fixed-step replay like the Lloyd loops.
    *
    * Scale shape per round: one equi-join of the bounded label
    * relation against the static symmetrized edge list (pre-partition
    * both by the key at 100 TB; edges partition once), then one
    * (dst, label) partial-agg count and one per-dst max — both
    * map-side combinable, shuffle rows ≤ distinct (dst, label) pairs,
    * never the raw neighbor multiset. Lineage truncated every other
    * round like the PageRank loop.
    */
  private[graft] def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.count() // bounded driver state: one scalar
    val e = edges(docs, n)
    // static symmetrized edge list cached once; the r16 repartition(src)
    // is reverted (per-round join broadcasts the label side — see
    // plans/r17/graph_prepartition_diag.txt)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val docIds = docs.select(col("doc_id").as("id")).persist()
    var labs = docIds.select(col("id"), col("id").as("lab"))
    for (it <- 1 to LpaIters) {
      val voted = sym.join(labs, col("src") === col("id"))
        .select(col("dst"), col("lab"))
        .groupBy("dst", "lab").agg(count(lit(1)).as("cnt"))
        .groupBy("dst")
        // max over struct(cnt, -lab): largest count, then smallest label
        .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("best"))
        .select(col("dst"), (-col("best.neg")).as("newlab"))
      // every node is a dst in sym (the ring edge symmetrized), so the
      // inner join preserves the node universe
      labs = docIds
        .join(voted, col("id") === col("dst"))
        .select(col("id"), col("newlab").as("lab"))
      if (it % 2 == 0 || it == LpaIters) labs = labs.localCheckpoint(true)
    }
    val sizes = labs.groupBy("lab").agg(count(lit(1)).as("csize"))
    labs.join(sizes, "lab")
      .select(col("id").as("doc_id"), col("lab").as("community"), col("csize"))
      .orderBy("community", "doc_id")
  }

  /** Triangle counting over the undirected fixture graph — the third
    * classic graph-analytics primitive beside [[pagerank]] and
    * [[labelProp]] (triangle density = clustering coefficient = the
    * standard spam-farm / link-ring curation signal). Edges are
    * canonicalized to ordered pairs u < v, so each triangle is
    * enumerated EXACTLY once as a < b < c by construction: wedge join
    * (a,b)⋈(b,c) then closure probe (a,c) — two equi-joins, no
    * direction dedup pass. At 100 TB the standard refinement applies
    * unchanged (orient edges low-degree → high-degree to bound wedge
    * fan-out by the arboricity); the fixture's degree is ~8 so the
    * plain ordered form is already bounded. All-integer.
    */
  private[graft] def triangles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.count() // bounded driver state: one scalar
    val und = edges(docs, n)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().persist()
    val tri = und.select(col("u").as("a"), col("v").as("b"))
      .join(und.select(col("u").as("b2"), col("v").as("c")), col("b") === col("b2"))
      .join(und.select(col("u").as("a3"), col("v").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .select("a", "b", "c").persist()
    val total = tri.count() // bounded driver state: one scalar
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      .withColumn("total_triangles", lit(total))
      .orderBy("doc_id")
  }

  /** k-CORE decomposition (membership in the k=5 core) — the fourth
    * classic graph-curation signal beside rank/community/triangles:
    * the k-core is the maximal subgraph where every node keeps ≥ k
    * neighbors INSIDE the subgraph, the standard "densely embedded
    * vs peripheral" split (link-farm cores, isolated spam tails) a
    * webgraph curation pass uses. Computed by synchronous peeling:
    * each round drops every node whose degree among SURVIVORS is
    * < k; a fixed 12 rounds bounds the plan (GraphSpec pins that the
    * fixture converges well inside that — round 13 changes nothing),
    * and each round is one semi-join-restricted degree count (two
    * equi-joins + one grouped agg), the same per-round shape as
    * labelProp with the same localCheckpoint lineage guard. At
    * 100 TB: no windows, no driver state beyond one scalar; the
    * textbook refinement (delta peeling — only re-check neighbors of
    * freshly dropped nodes) applies unchanged. */
  private[graft] def kcore(spark: SparkSession, dir: String, k: Int = 5,
                           iters: Int = 12): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.count() // bounded driver state: one scalar
    val e = edges(docs, n)
    // static symmetrized edge list cached once; the r16 repartition(src)
    // is reverted (per-round join broadcasts the survivor side — see
    // plans/r17/graph_prepartition_diag.txt)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var nodes = docs.select(col("doc_id").as("id"))
    // early fixpoint exit at checkpoint boundaries (optimization r16,
    // guide §1.2): peeling is MONOTONE (survivor sets only shrink), so
    // an unchanged count across a whole 3-round span proves the set
    // was already the fixpoint — remaining rounds are provably no-ops
    // and the result is IDENTICAL to running all `iters` (GraphSpec
    // pins that round iters+1 changes nothing). The count reads the
    // just-checkpointed blocks, so it is one cheap cached-scan job per
    // 3 rounds, against ~7 saved jobs per skipped round.
    var prevCount = -1L
    var it = 1
    var fixed = false
    while (it <= iters && !fixed) {
      val deg = sym
        .join(nodes, col("src") === col("id")).select("src", "dst")
        .join(nodes.select(col("id").as("id2")), col("dst") === col("id2"))
        .groupBy("src").agg(count(lit(1)).as("deg"))
      nodes = deg.filter(col("deg") >= k).select(col("src").as("id"))
      if (it % 3 == 0 || it == iters) {
        nodes = nodes.localCheckpoint(true)
        val c = nodes.count()
        if (c == prevCount) fixed = true
        prevCount = c
      }
      it += 1
    }
    // Emit from the SURVIVOR set, left-joined to the recount: before
    // the fixpoint a last-round survivor can recount to zero against
    // the final survivors — it must appear with core_deg 0 (matching
    // the SQL oracle), not silently vanish via an inner join.
    val deg = sym.join(nodes, col("src") === col("id")).select("src", "dst")
      .join(nodes.select(col("id").as("id2")), col("dst") === col("id2"))
      .groupBy("src").agg(count(lit(1)).as("core_deg"))
    nodes.join(deg, col("id") === col("src"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_pagerank" -> ((s, d) => pagerank(s, d)),
    "gr_labelprop" -> ((s, d) => labelProp(s, d)),
    "gr_triangles" -> ((s, d) => triangles(s, d)),
    "gr_kcore" -> ((s, d) => kcore(s, d))
  )

  // ---------------------------------------------------------------- oracle

  private def hexValSql(c: String): String =
    s"(CASE WHEN ascii($c) >= 97 THEN ascii($c) - 87 ELSE ascii($c) - 48 END)"

  private val prHashSql = {
    val h = "md5('pr:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR))"
    s"""(((${hexValSql(s"substr($h, 1, 1)")} * 16
       | + ${hexValSql(s"substr($h, 2, 1)")}) * 16
       | + ${hexValSql(s"substr($h, 3, 1)")}) * 16
       | + ${hexValSql(s"substr($h, 4, 1)")})""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // The ENTIRE 8-iteration power method replayed list-packed (the
    // kmeansCte technique): state = one row holding the rank list
    // ordered by id; in-neighbor ids + outdegs pre-packed as parallel
    // list-of-lists so the recursive term is pure list arithmetic.
    "gr_pagerank" ->
      s"""WITH RECURSIVE prn AS (SELECT count(*) AS nn FROM documents),
         |pre AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, CAST($prHashSql AS BIGINT) % nn AS dst
         |    FROM documents, (SELECT unnest([0, 1, 2]) AS s) s, prn
         |    UNION ALL
         |    SELECT doc_id AS src, (doc_id + 1) % nn AS dst FROM documents, prn)
         |  WHERE src <> dst),
         |prout AS (SELECT src, count(*) AS outdeg FROM pre GROUP BY src),
         |prinl AS (
         |  SELECT e.dst, list(e.src ORDER BY e.src) AS srcs,
         |         list(o.outdeg ORDER BY e.src) AS outds
         |  FROM pre e JOIN prout o ON o.src = e.src
         |  GROUP BY e.dst),
         |packed AS (
         |  SELECT any_value(n.nn) AS nn,
         |    list(COALESCE(i.srcs, CAST([] AS BIGINT[])) ORDER BY d.doc_id) AS srcs,
         |    list(COALESCE(i.outds, CAST([] AS BIGINT[])) ORDER BY d.doc_id) AS outds
         |  FROM documents d
         |  LEFT JOIN prinl i ON i.dst = d.doc_id
         |  CROSS JOIN prn n),
         |priter AS (
         |  SELECT 0 AS it, list_transform(range(0, nn), x -> '1.0'::DOUBLE / nn) AS ranks
         |  FROM packed
         |  UNION ALL
         |  SELECT r.it + 1, list_transform(range(0, p.nn), i ->
         |    '0.15'::DOUBLE / p.nn + '0.85'::DOUBLE * list_reduce(
         |      list_prepend('0.0'::DOUBLE,
         |        list_transform(range(1, len(p.srcs[i + 1]) + 1),
         |          j -> r.ranks[p.srcs[i + 1][j] + 1] / CAST(p.outds[i + 1][j] AS DOUBLE))),
         |      (a, b) -> a + b))
         |  FROM priter r, packed p WHERE r.it < $Iters),
         |unp AS (
         |  SELECT CAST(generate_subscripts(ranks, 1) - 1 AS BIGINT) AS doc_id,
         |         unnest(ranks) AS pagerank
         |  FROM priter WHERE it = $Iters),
         |prindeg AS (SELECT dst, count(*) AS c FROM pre GROUP BY dst)
         |SELECT u.doc_id, u.pagerank, o.outdeg AS out_deg,
         |  COALESCE(g.c, 0) AS in_deg
         |FROM unp u
         |JOIN prout o ON o.src = u.doc_id
         |LEFT JOIN prindeg g ON g.dst = u.doc_id
         |ORDER BY u.pagerank DESC, u.doc_id""".stripMargin,

    // All LpaIters synchronous rounds replayed list-packed: state =
    // one row holding the label list ordered by id; per-node neighbor
    // id lists pre-packed. The vote (max count, min label) is pure
    // integer list arithmetic — list_filter counts, list_max for the
    // mode count, list_min over the arg-set — so every round is
    // bit-identical to the Spark groupBy/max(struct) form.
    "gr_labelprop" -> {
      val ls = "list_transform(p.nbrs[i + 1], u -> r.labs[u + 1])"
      s"""WITH RECURSIVE prn AS (SELECT count(*) AS nn FROM documents),
         |pre AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, CAST($prHashSql AS BIGINT) % nn AS dst
         |    FROM documents, (SELECT unnest([0, 1, 2]) AS s) s, prn
         |    UNION ALL
         |    SELECT doc_id AS src, (doc_id + 1) % nn AS dst FROM documents, prn)
         |  WHERE src <> dst),
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM pre UNION ALL SELECT dst, src FROM pre)),
         |lpn AS (SELECT dst, list(src ORDER BY src) AS nbrs FROM und GROUP BY dst),
         |lpacked AS (
         |  SELECT any_value(n.nn) AS nn,
         |    list(COALESCE(i.nbrs, CAST([] AS BIGINT[])) ORDER BY d.doc_id) AS nbrs
         |  FROM documents d
         |  LEFT JOIN lpn i ON i.dst = d.doc_id
         |  CROSS JOIN prn n),
         |lpiter AS (
         |  SELECT 0 AS it, list_transform(range(0, nn), x -> x) AS labs
         |  FROM lpacked
         |  UNION ALL
         |  SELECT r.it + 1, list_transform(range(0, p.nn), i ->
         |    list_min(list_filter($ls,
         |      x -> len(list_filter($ls, y -> y = x)) =
         |        list_max(list_transform($ls,
         |          x2 -> len(list_filter($ls, y2 -> y2 = x2)))))))
         |  FROM lpiter r, lpacked p WHERE r.it < $LpaIters),
         |unl AS (
         |  SELECT CAST(generate_subscripts(labs, 1) - 1 AS BIGINT) AS doc_id,
         |         unnest(labs) AS community
         |  FROM lpiter WHERE it = $LpaIters),
         |lsz AS (SELECT community, CAST(count(*) AS BIGINT) AS csize
         |        FROM unl GROUP BY community)
         |SELECT u.doc_id, u.community, z.csize
         |FROM unl u JOIN lsz z USING (community)
         |ORDER BY u.community, u.doc_id""".stripMargin
    },

    // Ordered-pair canonicalization, the wedge join and the closure
    // probe replayed; per-node counts via the 3-way unnest.
    "gr_triangles" ->
      s"""WITH prn AS (SELECT count(*) AS nn FROM documents),
         |pre AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, CAST($prHashSql AS BIGINT) % nn AS dst
         |    FROM documents, (SELECT unnest([0, 1, 2]) AS s) s, prn
         |    UNION ALL
         |    SELECT doc_id AS src, (doc_id + 1) % nn AS dst FROM documents, prn)
         |  WHERE src <> dst),
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM pre),
         |tri AS (
         |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM und e1
         |  JOIN und e2 ON e2.u = e1.v
         |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
         |tcnt AS (
         |  SELECT x AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT unnest([a, b, c]) AS x FROM tri) GROUP BY x),
         |ttot AS (SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri)
         |SELECT doc_id, n_triangles, total_triangles
         |FROM tcnt CROSS JOIN ttot ORDER BY doc_id""".stripMargin,
    // The 12-round synchronous peel replayed list-packed (the
    // pagerank technique: one row holds the alive bitmap ordered by
    // doc_id, adjacency pre-packed as a list of lists; each recursive
    // step recomputes alive[i] = alive AND ≥5 alive neighbors).
    "gr_kcore" ->
      s"""WITH RECURSIVE prn AS (SELECT count(*) AS nn FROM documents),
         |pre AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, CAST($prHashSql AS BIGINT) % nn AS dst
         |    FROM documents, (SELECT unnest([0, 1, 2]) AS s) s, prn
         |    UNION ALL
         |    SELECT doc_id AS src, (doc_id + 1) % nn AS dst FROM documents, prn)
         |  WHERE src <> dst),
         |sym AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM pre
         |    UNION ALL SELECT dst AS src, src AS dst FROM pre)),
         |adjl AS (SELECT src, list(dst ORDER BY dst) AS adj FROM sym GROUP BY src),
         |packed AS (
         |  SELECT list(COALESCE(a.adj, CAST([] AS BIGINT[])) ORDER BY d.doc_id)
         |    AS adj
         |  FROM documents d LEFT JOIN adjl a ON a.src = d.doc_id),
         |peel AS (
         |  SELECT 0 AS iter,
         |    (SELECT list_transform(list(doc_id ORDER BY doc_id), x -> TRUE)
         |     FROM documents) AS alive
         |  UNION ALL
         |  SELECT iter + 1,
         |    list_transform(range(1, len(alive) + 1),
         |      i -> alive[i] AND
         |           len(list_filter(p.adj[i], x -> alive[(x + 1)::INT])) >= 5)
         |  FROM peel, packed p WHERE iter < 12),
         |fin AS (SELECT alive FROM peel WHERE iter = 12),
         |core AS (
         |  SELECT CAST(i - 1 AS BIGINT) AS doc_id,
         |    CAST(len(list_filter(p.adj[i::INT], x -> f.alive[(x + 1)::INT]))
         |      AS BIGINT) AS core_deg
         |  FROM fin f, packed p, (SELECT unnest(range(1, len(alive) + 1)) AS i
         |                         FROM fin) r
         |  WHERE f.alive[i::INT])
         |SELECT doc_id, core_deg FROM core ORDER BY doc_id""".stripMargin
  )
}
