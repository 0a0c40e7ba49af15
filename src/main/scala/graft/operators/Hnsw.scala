package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.RandomHyperplane
import graft.functions.VectorFunctions.dot

/** HNSW-LITE: a deterministic hierarchical navigable-small-world ANN
  * tier — the graph-index family of the reference's actual physical
  * store (Chroma HNSW, `backend/app/services/vector/vector_db_service
  * .py:73-76`, `hnsw:space=cosine`), re-expressed for a data-parallel
  * engine. Classic HNSW (Malkov & Yashunin 2016) is built by
  * SEQUENTIAL insertion with randomized levels — unreplayable across
  * engines and hostile to distributed construction. This variant keeps
  * the two load-bearing ideas (a level hierarchy for long hops + a
  * navigable neighborhood graph for local hops) and makes both
  * deterministic and bulk-buildable:
  *
  *  - LEVELS: node levels come from a seed-free hash of the id —
  *    `level(v) = trailing-zeros(((v + 7) · 2860486313) >> 16)` capped
  *    at `maxLevel` — the same geometric (p = 1/2) ladder HNSW draws
  *    from `-ln(U)·mL`, but replayable bit-for-bit in SQL. The
  *    multiplier is distinct from the RP-LSH planes' 2654435761 and
  *    SyntheticVec's 2246822519, so levels are uncorrelated with both.
  *  - EDGES: each level's graph is a blocked kNN graph — candidates
  *    are LSH-blocked on the low `max(B0 − lvl, 1)` bits of the shared
  *    8-bit RP code. Node population halves per level and so does the
  *    bucket count, so occupancy is CONSTANT (≈ n / 2^B0) at every
  *    level — at 100 TB, B0 = log2(n / target-occupancy) keeps the
  *    per-bucket join bounded. Each node's candidates come from its
  *    own block plus every Hamming-1 probe block (the multiprobe trick
  *    from `ann_rp_lsh`) — without cross-block probes the graph
  *    fractures at bucket boundaries and the walk cannot navigate
  *    (measured: recall@10 0.2 vs 1.0 on the fixture). Each node keeps
  *    its top-M by (dot desc, id asc); edges are symmetrized (directed
  *    top-M ∪ reverse, deduped — HNSW's reverse-link step without its
  *    heuristic prune). Build is one equi-join on the block key + one
  *    BOUNDED per-src top-M aggregation per level (TopKAggregator —
  *    map-side partial, so the shuffle carries ~n·M rows, never the
  *    candidate pairs) — the `ann_lsh_knn_join` shape, never all-pairs.
  *  - SEARCH: greedy beam descent. Entry = the (level desc, id asc)
  *    first node; one expand-and-truncate round per upper level with a
  *    narrow beam (`efUpper`), then `rounds0` rounds on level 0 with
  *    the wide beam (`ef`); every truncation orders by (sim desc,
  *    id asc). Fixed rounds instead of converge-detection keep the
  *    whole walk a finite deterministic plan — the same choice kcore
  *    makes — so the DuckDB oracle replays it exactly (list-packed
  *    recursive CTE, the pagerank technique).
  *
  * Scale posture (100 TB): construction is per-level equi-join +
  * bounded top-M agg — candidate pairs stream through codegen and only
  * ~n·M aggregated rows shuffle, with the same hot-key defense as the
  * LSH family (block key is a hash). The adjacency
  * relation is (lvl, src, dst) partitionable by src; batch search
  * (`searchBatch`) advances ALL queries one round per join against it
  * — per-round shuffle ≤ queries × beam × degree rows, and co-
  * partitioning adjacency + vectors by id makes the expand a local
  * join. The single-query walk collects only beam ids (≤ ef ≪ corpus)
  * per round — bounded driver state, faithful to the sequential
  * algorithm the way V9's greedy is. */
object Hnsw {

  val MaxLevel = 3
  val M = 8          // kept neighbors per node per level (pre-symmetrize)
  val B0 = 4         // level-0 block bits (buckets = 2^B0; scale with n)
  val Ef = 32        // level-0 beam
  val EfUpper = 8    // upper-level beam
  val Rounds0 = 3    // level-0 expand rounds

  /** The seeded gate's fixed descent plan: one level-1 hop wide, then
    * two level-0 rounds (shared by the Spark gate and its oracle). */
  val SeededPlan: Seq[(Int, Int)] = Seq((1, 16), (0, Ef), (0, Ef))

  /** SKETCH-RANKED build (the round-13 build-cost lever — the exact
    * build's level-0 block join computed ~490M 768-d dots and
    * shuffled every pair; 121 s at 500k×768): each node's top-M edges
    * are ranked by 128-bit sign-sketch Hamming distance (xor+popcount
    * on two longs ≈ 300× cheaper than a 768-d dot, computed ONCE per
    * node), so the block joins stream only (id + two longs) rows and
    * the embeddings never enter the build. The sketch estimates angle
    * with ~8° std — far below the ~47° mate/stranger separation on
    * clustered corpora — so edges still connect near neighbors and
    * the SEARCH (which scores exact sims) is unaffected structurally;
    * edge sets differ from the exact build only in within-
    * neighborhood ordering. Bench-tier only: the sf ORACLE GATES
    * never pass a prefilter and stay bit-exact. `words` maps an
    * embedding column to BOTH sketch words as array<long> in one pass
    * (callers supply the planes — BenchVec uses splitmix planes
    * matching its corpus; one UDF, because each separate UDF pays the
    * Seq→Array conversion and invocation overhead again). */
  final case class BuildPrefilter(words: Column => Column)

  /** Block bits at a level: halve buckets as the population halves —
    * occupancy stays ≈ n / 2^b0 at every level. Blocks NEST (one bit
    * of code resolution dropped per level), so each level's edges span
    * two child blocks of the level below: the ladder itself is the
    * cross-block routing structure, all the way to bits = 0 where the
    * thin top levels are single-block all-pairs over a handful of
    * nodes. */
  def blockBits(l: Int, b0: Int = B0): Int = math.max(b0 - l, 0)

  /** Deterministic geometric level of an id column (0..maxLevel):
    * trailing-zero count of the mixed hash, capped. P(level ≥ l) =
    * 2^−l — HNSW's geometric ladder without its RNG. maxLevel scales
    * as ~log2(n / occupancy) so the top level is a handful of nodes.
    * The id is masked to its low 31 bits before the multiply: the
    * worst-case product (2^31 + 7) · 2860486313 ≈ 6.1e18 stays inside
    * Int64, so the mixer never overflows (ANSI-on Spark 4 and DuckDB
    * both THROW on BIGINT overflow — the unmasked form died at ids
    * above ~3.2e9, i.e. exactly the multi-billion-vector regime this
    * tier is for). Ids sharing low bits share a level — harmless,
    * levels are a sampling ladder, not an identity. */
  def levelCol(id: Column, maxLevel: Int = MaxLevel): Column = {
    val g = shiftright(
      (id.bitwiseAND(lit(0x7FFFFFFFL)) + lit(7L)) * lit(2860486313L), 16)
    (0 until maxLevel).foldRight(lit(maxLevel): Column)((l, acc) =>
      when(g % lit(1L << (l + 1)) === lit(1L << l), lit(l)).otherwise(acc))
  }

  /** DuckDB expression mirroring [[levelCol]] bit for bit — the WHEN
    * ladder is generated from the same (0 until maxLevel) range the
    * Column fold walks, so any maxLevel replays (the hand-written
    * 3-branch CASE silently collapsed levels ≥ 3 for other ladders). */
  def levelSql(idExpr: String, maxLevel: Int = MaxLevel): String = {
    val g = s"(((($idExpr & 2147483647) + 7) * 2860486313) >> 16)"
    val whens = (0 until maxLevel)
      .map(l => s"WHEN $g % ${1L << (l + 1)} = ${1L << l} THEN $l")
      .mkString(" ")
    s"(CASE $whens ELSE $maxLevel END)"
  }

  /** Bulk-build the level graphs: returns (lvl, src, dst) adjacency.
    * `vectors` needs (vec_id, embedding). `codeFn` supplies the block
    * code (the engine default is the shared 8-bit RP code; BenchVec
    * passes splitmix planes — see its occupancy note).
    *
    * `siblingProbe` (default on) adds each node's SIBLING block — the
    * flip of the highest kept bit — to its candidate set. This is the
    * load-bearing cross-block lever, and the top bit is the RIGHT one:
    * descending the ladder ADDS one (higher) code bit per level, so
    * the only disagreement the walk must correct at level l is that
    * level's newest top bit — lower bits were already corrected at the
    * higher level where THEY were newest. Sibling edges make each
    * level's graph span its parent block exactly. Replication factor
    * is 2 regardless of b0 (an every-bit Hamming-1 probe set was tried
    * first and shuffles bits+1 embedding-carrying copies — 42 GB at
    * the 500k bench — for cross-links the ladder makes redundant).
    * Only bounded per-src aggregates reach the exchange. */
  def build(vectors: DataFrame, m: Int = M, maxLevel: Int = MaxLevel,
            b0: Int = B0, siblingProbe: Boolean = true,
            floorBoost: Int = 0,
            codeFn: Column => Column = RandomHyperplane.codeCol(_),
            prefilter: Option[BuildPrefilter] = None): DataFrame =
    symmetrize(buildDirected(vectors, m, maxLevel, b0, siblingProbe,
      floorBoost, codeFn, prefilter))

  /** Effective block bits at level l (floorBoost COARSENS level 0's
    * blocks by `floorBoost` bits — occupancy × 2^boost: on clustered
    * corpora, cluster-mates rarely share a full-resolution code, so
    * the level-0 graph fragments INSIDE clusters and top-k recall
    * caps out even when the walk finds the right cluster — measured
    * 0.65 → 0.81 recall@10 at the 50k pilot with boost 3; cost is
    * linear in 2^boost). */
  private def effBits(l: Int, b0: Int, floorBoost: Int): Int =
    math.max(blockBits(l, b0) - (if (l == 0) floorBoost else 0), 0)

  /** The DIRECTED per-node top-M edge relation (lvl, src, dst). Each
    * node's edges depend ONLY on its block ∪ sibling block's content —
    * the block-locality that makes incremental maintenance exact
    * ([[maintainDirected]]). */
  def buildDirected(vectors: DataFrame, m: Int = M, maxLevel: Int = MaxLevel,
                    b0: Int = B0, siblingProbe: Boolean = true,
                    floorBoost: Int = 0,
                    codeFn: Column => Column = RandomHyperplane.codeCol(_),
                    prefilter: Option[BuildPrefilter] = None): DataFrame =
    prefilter match {
      case None =>
        val lv = vectors.select(col("vec_id"), col("embedding"),
          levelCol(col("vec_id"), maxLevel).as("nlvl"),
          codeFn(col("embedding")).as("code"))
        (0 to maxLevel).map { l =>
          val bits = effBits(l, b0, floorBoost)
          val n = lv.filter(col("nlvl") >= l)
            .select(col("vec_id"), col("embedding"),
              (col("code") % lit(1L << math.max(bits, 0))).as("blk"))
          directedForLevel(n, l, bits, m, siblingProbe)
        }.reduce(_ unionByName _)
      case Some(p) =>
        // SLIM sketch relation (id + level + code + two sketch longs ≈
        // 40 B/row — the 768-d embeddings never enter the build), and
        // ALL levels in ONE join: each node explodes into its level
        // ladder (Σ n/2⁻ˡ ≈ 2n rows), the block join keys on
        // (lvl, blk), and one bounded top-M aggregation keyed on the
        // packed (src, lvl) finishes the graph. The per-level form ran
        // 14 join+agg stages whose scheduler floors serialized (~2.5 s
        // per thin upper level); this is one pipeline.
        val sk = vectors.select(col("vec_id"),
            levelCol(col("vec_id"), maxLevel).as("nlvl"),
            codeFn(col("embedding")).as("code"),
            p.words(col("embedding")).as("skw"))
          .select(col("vec_id"), col("nlvl"), col("code"),
            element_at(col("skw"), 1).as("sk0"),
            element_at(col("skw"), 2).as("sk1"))
        val boostExpr =
          s"greatest($b0 - lvl - if(lvl = 0, $floorBoost, 0), 0)"
        val nAll = sk
          .select(col("vec_id"), col("sk0"), col("sk1"), col("code"),
            explode(sequence(lit(0), col("nlvl"))).as("lvl"))
          .withColumn("bits", expr(boostExpr))
          .withColumn("blk", expr("code % shiftleft(1L, bits)"))
          .persist()
        val probed = nAll.withColumn("pblk",
          explode(if (siblingProbe)
            when(col("bits") >= 1,
              array(col("blk"),
                expr("blk ^ shiftleft(1L, bits - 1)"))).otherwise(array(col("blk")))
          else array(col("blk"))))
        // Pack the whole candidate row into TWO longs: group key
        // g = src·16 + lvl (lvl ≤ 15 by ladder design) and value
        // pv = hamming << 48 | dst (hamming ≤ 128, dst < 2^48) — the
        // natural long order on pv IS (hamming asc, dst asc). The
        // per-group top-M runs in two bounded stages: a per-partition
        // primitive top-M (mapPartitions over a LongMap of m-slot
        // sorted arrays — a group's candidates live in ≤ 2 partitions
        // by block locality, so memory is srcs-per-partition × m
        // longs, and the ~550M-pair stream never reaches a shuffle or
        // an unbounded buffer), then a final merge over the ≤ 2m rows
        // per group. A typed TopKAggregator here paid an
        // object-boundary per candidate row (~4× the join's own
        // cost); an unbounded collect_list partial OOMed — the
        // bounded primitive pass is the shape that survives 100 TB.
        val hammed = probed.select(col("lvl"), col("pblk").as("blk"),
            col("vec_id").as("src"), col("sk0").as("a0"), col("sk1").as("a1"))
          .join(nAll.select(col("lvl"), col("blk"), col("vec_id").as("dst"),
            col("sk0").as("b0"), col("sk1").as("b1")), Seq("lvl", "blk"))
          .filter(col("src") =!= col("dst"))
          .select((col("src") * 16 + col("lvl")).as("g"),
            expr("shiftleft(cast(bit_count(a0 ^ b0) + bit_count(a1 ^ b1)" +
              " as bigint), 48) | dst").as("pv"))
        val partial = {
          import hammed.sparkSession.implicits._
          val mm = m
          hammed.as[(Long, Long)].mapPartitions { it =>
            val best = new scala.collection.mutable.LongMap[Array[Long]]()
            while (it.hasNext) {
              val (g, pv) = it.next()
              val arr = best.getOrNull(g)
              if (arr == null) {
                val a = Array.fill(mm)(Long.MaxValue); a(0) = pv
                best.update(g, a)
              } else if (pv < arr(mm - 1)) {
                // insert-sort into the ascending m-slot array
                var i = mm - 1
                while (i > 0 && arr(i - 1) > pv) { arr(i) = arr(i - 1); i -= 1 }
                arr(i) = pv
              }
            }
            best.iterator.flatMap { case (g, arr) =>
              arr.iterator.takeWhile(_ != Long.MaxValue).map(pv => (g, pv))
            }
          }.toDF("g", "pv")
        }
        val res = partial.groupBy("g")
          .agg(slice(array_sort(collect_list(col("pv"))), 1, m).as("top"))
          .select(col("g"), explode(col("top")).as("pv"))
          .select((col("g") % 16).cast("int").as("lvl"),
            expr("g div 16").as("src"),
            expr("pv & 281474976710655").as("dst")) // low 48 bits
          .localCheckpoint() // nAll is consumed here
        nAll.unpersist()
        res
    }

  /** Bounded per-src top-k of (src, dst, score) via the typed
    * [[graft.functions.TopKAggregator]] — identical selection to a
    * `row_number().over(partitionBy(src).orderBy(score desc, dst
    * asc)) <= k` window (total order, deterministic), but partial-
    * aggregatable: each map task keeps ≤ k rows per src, so the
    * shuffle carries ~n·k rows instead of every candidate pair. At
    * the 500k bench the window form shuffled all ~490M level-0 pairs
    * (~20 GB) into a sort — the dominant build cost; the agg form
    * shuffles ~8M bounded rows. */
  private[graft] def topKPerSrc(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    scored.select(col("src"), col("score"), col("dst"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.ScoredRow(t._2, t._3))
      .agg(graft.functions.TopK.topK(k).name("top"))
      .toDF("src", "top")
      .select(col("src"), explode(col("top")).as("r"))
      .select(col("src"), col("r.id").as("dst"))
  }

  /** Directed top-M edges for ONE level's node relation (vec_id,
    * embedding, blk). The a-side is replicated into its own block +
    * the sibling block; a candidate pair appears exactly once. */
  private[graft] def directedForLevel(n: DataFrame, l: Int, bits: Int, m: Int,
                               siblingProbe: Boolean): DataFrame = {
    val probeCols =
      if (!siblingProbe || bits == 0) Seq(col("blk"))
      else Seq(col("blk"), col("blk").bitwiseXOR(lit(1L << (bits - 1))))
    val probed = n.withColumn("pblk", explode(array(probeCols: _*)))
    val scored = probed.select(col("pblk").as("blk"),
        col("vec_id").as("src"), col("embedding").as("ea"))
      .join(n.select(col("blk"), col("vec_id").as("dst"),
        col("embedding").as("eb")), Seq("blk"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", dot(col("ea"), col("eb")))
      .select("src", "dst", "score")
    topKPerSrc(scored, m)
      .select(lit(l).as("lvl"), col("src"), col("dst"))
  }

  /** Directed → search adjacency: union the reverse links, dedup. */
  def symmetrize(directed: DataFrame): DataFrame =
    directed.select("lvl", "src", "dst")
      .union(directed.select(col("lvl"), col("dst").as("src"),
        col("src").as("dst")))
      .distinct()

  /** INCREMENTAL maintenance of the directed edge relation — the
    * graph-tier counterpart of the CDC-maintained IVF (x17): work is
    * O(churned blocks × occupancy), never a corpus rebuild. Because a
    * node's directed edges depend ONLY on its block ∪ sibling block,
    * a batch of added/removed ids invalidates EXACTLY the blocks the
    * churned ids occupy plus their siblings (the churned block is in
    * those nodes' candidate sets); recomputing those blocks' nodes
    * against the post-churn corpus and keeping every other node's
    * edges verbatim is EQUAL — bit-for-bit, not approximately — to a
    * from-scratch rebuild, which is exactly what the
    * `ann_hnsw_incremental` oracle pins (the oracle replays the
    * full-corpus graph; the engine only ever computes the delta).
    * `vectors` is the POST-churn corpus; `churned` holds the (vec_id,
    * embedding) rows added and/or removed — removed rows are absent
    * from `vectors`, so their block membership (what must be
    * invalidated) is derived from their OWN codes here. */
  def maintainDirected(vectors: DataFrame, directedOld: DataFrame,
                       churned: DataFrame, m: Int = M,
                       maxLevel: Int = MaxLevel, b0: Int = B0,
                       siblingProbe: Boolean = true, floorBoost: Int = 0,
                       codeFn: Column => Column = RandomHyperplane.codeCol(_)): DataFrame = {
    val lv = vectors.select(col("vec_id"), col("embedding"),
      levelCol(col("vec_id"), maxLevel).as("nlvl"),
      codeFn(col("embedding")).as("code")).persist()
    val churnLv = churned.select(col("vec_id"),
      levelCol(col("vec_id"), maxLevel).as("nlvl"),
      codeFn(col("embedding")).as("code"))
    val out = (0 to maxLevel).map { l =>
      val bits = effBits(l, b0, floorBoost)
      val n = lv.filter(col("nlvl") >= l)
        .select(col("vec_id"), col("embedding"),
          (col("code") % lit(1L << math.max(bits, 0))).as("blk"))
      val churnBlks = churnLv.filter(col("nlvl") >= l)
        .select((col("code") % lit(1L << math.max(bits, 0))).as("blk"))
        .distinct().collect().map(_.getLong(0))
      val affected: Set[Long] =
        if (bits == 0) churnBlks.map(_ => 0L).toSet
        else churnBlks.flatMap(b => Seq(b, b ^ (1L << (bits - 1)))).toSet
      if (affected.isEmpty)
        directedOld.filter(col("lvl") === l)
      else {
        val keep = directedOld.filter(col("lvl") === l)
          .join(broadcast(n.filter(col("blk").isin(affected.toSeq: _*))
            .select(col("vec_id").as("src"))), Seq("src"), "left_anti")
          // removed nodes keep stale rows otherwise: edges whose src
          // or dst vanished from the corpus are dropped
          .join(n.select(col("vec_id").as("src")), Seq("src"), "left_semi")
          .join(n.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
          .select("lvl", "src", "dst")
        val recomputed = directedForLevel(
          n.filter(col("blk").isin(affected.toSeq: _*))
            // candidates of an affected-block node live in its block ∪
            // sibling — both must be present in the level relation the
            // recompute sees, so widen by one sibling ring
            .unionByName(n.filter(col("blk").isin(affected.flatMap(b =>
              if (bits == 0) Seq(b)
              else Seq(b, b ^ (1L << (bits - 1)))).toSeq.distinct: _*)))
            .distinct(), l, bits, m, siblingProbe)
          // the ring nodes were only candidates — emit edges ONLY for
          // affected-block srcs
          .join(broadcast(n.filter(col("blk").isin(affected.toSeq: _*))
            .select(col("vec_id").as("src"))), Seq("src"), "left_semi")
          .select("lvl", "src", "dst")
        keep.unionByName(recomputed)
      }
    }.reduce(_ unionByName _)
    val res = out.localCheckpoint() // materializes — lv is consumed here
    lv.unpersist()                  // CDC path runs per batch: don't let
    res                             // cached corpus copies accumulate
  }

  /** The search schedule: (level, beam width) per round —
    * `upperRounds` expand-rounds per upper level with the narrow beam
    * (classic HNSW iterates each layer to a local minimum; a fixed
    * round count keeps the walk a finite deterministic plan, and at
    * deep ladders one round per level under-navigates), then `rounds0`
    * wide rounds on level 0. */
  def schedule(maxLevel: Int, ef: Int, efUpper: Int,
               rounds0: Int, upperRounds: Int): Seq[(Int, Int)] =
    (maxLevel to 1 by -1).flatMap(l =>
      Seq.fill(upperRounds)((l, efUpper))) ++ Seq.fill(rounds0)((0, ef))

  /** WIDE-UPPER schedule — the clustered-corpus navigation shape: on
    * corpora whose latent clusters are mutually near-orthogonal (the
    * BENCHVEC twin corpus; common in multi-domain embedding spaces)
    * greedy descent is BLIND until a beam member lands in the target
    * cluster — there is no similarity gradient between orthogonal
    * clusters to climb. The ladder fixes this structurally: stay wide
    * (keep ~everything) through the thin top levels until the level
    * where every cluster still has a representative (≈ log2(n /
    * clusterSize) + log2(clusterSize) − log2(width)… practically: the
    * level whose node count ≈ the wide width), then narrow. Measured
    * on the 500k clustered twin: default narrow schedule recall@10
    * 0.05; wide-upper ≥ 0.8 at ~3–6 % of the corpus visited. */
  def wideSchedule(maxLevel: Int, wide: Int, narrowFrom: Int, narrow: Int,
                   ef: Int, rounds0: Int): Seq[(Int, Int)] =
    (maxLevel to 1 by -1).map(l =>
      (l, if (l >= narrowFrom) wide else narrow)) ++
      Seq.fill(rounds0)((0, ef))

  /** The deterministic global entry: the (level desc, id asc) first
    * node — compute ONCE per index and pass to the search calls (a
    * full-scan argmax per query is the driver-round-trip
    * anti-pattern). */
  def entryOf(vectors: DataFrame, maxLevel: Int = MaxLevel): Long =
    vectors.select(col("vec_id"), levelCol(col("vec_id"), maxLevel).as("nlvl"))
      .orderBy(col("nlvl").desc, col("vec_id").asc).limit(1)
      .head().getLong(0)

  /** Single-query top-k via the deterministic beam walk. Driver state
    * per round = the beam's ids (≤ ef) — the bounded-collect pattern
    * (IVF centroids, V9 greedy), faithful to sequential HNSW search. */
  def search(vectors: DataFrame, adj: DataFrame, q: Seq[Double], k: Int = 10,
             ef: Int = Ef, efUpper: Int = EfUpper, rounds0: Int = Rounds0,
             maxLevel: Int = MaxLevel, upperRounds: Int = 1,
             entry0: Long = -1L, sched: Seq[(Int, Int)] = Nil): DataFrame = {
    val sims = vectors.select(col("vec_id"),
      dot(col("embedding"), typedLit(q)).as("sim"))
    val entry = if (entry0 >= 0) entry0 else entryOf(vectors, maxLevel)
    var beam = Seq(entry)
    val plan = if (sched.nonEmpty) sched
      else schedule(maxLevel, ef, efUpper, rounds0, upperRounds)
    for ((l, e) <- plan) {
      val nbrs = adj.filter(col("lvl") === l && col("src").isin(beam: _*))
        .select("dst").distinct().collect().map(_.getLong(0))
      val cand = (beam ++ nbrs).distinct
      beam = sims.filter(col("vec_id").isin(cand: _*))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(e)
        .collect().map(_.getLong(0)).toSeq
    }
    sims.filter(col("vec_id").isin(beam: _*))
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow.orderBy(col("vec_id"),
          col("sim").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("rank", "vec_id", "sim").orderBy("rank")
  }

  /** Batch top-k: advance EVERY query one round per join — the scale
    * path (Q × beam × degree rows shuffled per round, adjacency
    * partitionable by src). `queries` needs (q_id, q_emb). */
  def searchBatch(vectors: DataFrame, adj: DataFrame, queries: DataFrame,
                  k: Int = 10, ef: Int = Ef, efUpper: Int = EfUpper,
                  rounds0: Int = Rounds0, maxLevel: Int = MaxLevel,
                  upperRounds: Int = 1, entry0: Long = -1L,
                  sched: Seq[(Int, Int)] = Nil): DataFrame = {
    val entry = if (entry0 >= 0) entry0 else entryOf(vectors, maxLevel)
    val emb = vectors.select(col("vec_id"), col("embedding"))
    // Every per-round join BROADCASTS the frontier side (≤ Q × width
    // rows) so each round is a pair of scans — the adjacency level
    // partition and the vector table — with NO shuffle of either. The
    // first form shuffled the embedding relation every round; at the
    // 500k bench the accumulated per-round shuffle files filled the
    // disk (16 rounds × ~6 GB) before ContextCleaner could reap them.
    // At cluster scale the same broadcasts hold (frontiers are tiny),
    // and co-partitioning adj+vectors by id upgrades both scans to
    // pruned local reads.
    def scored(cand: DataFrame): DataFrame =
      emb.join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("sim", dot(col("embedding"), col("q_emb")))
        .select("q_id", "vec_id", "sim")
    var beam = scored(queries.select(col("q_id"), lit(entry).as("vec_id")))
    val plan = if (sched.nonEmpty) sched
      else schedule(maxLevel, ef, efUpper, rounds0, upperRounds)
    for ((l, e) <- plan) {
      val expand = adj.filter(col("lvl") === l)
        .join(broadcast(beam.select(col("q_id"), col("vec_id").as("src"))),
          Seq("src"))
        .select(col("q_id"), col("dst").as("vec_id")).distinct()
        .join(broadcast(beam.select("q_id", "vec_id")),
          Seq("q_id", "vec_id"), "left_anti")
      beam = beam.unionByName(scored(expand))
        .withColumn("rk", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id").asc)))
        .filter(col("rk") <= e).drop("rk")
        .localCheckpoint() // truncate the per-round join lineage
    }
    beam.withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "sim").orderBy("q_id", "rank")
  }

  /** FLAT-SEED batch search: the initial beam is the per-query
    * top-`seedWidth` of an EXHAUSTIVE scan of `seedPool` (the sparse
    * union of all levels ≥ some cutoff — a deterministic 2^-cutoff
    * hash sample of the corpus, so at scale it is one level-banded
    * partition read of a few percent of the table), then the graph
    * descent runs the given schedule over the remaining levels. On
    * near-orthogonal-cluster corpora this replaces the one leg of the
    * walk that cannot work — greedy hops BETWEEN clusters with no
    * similarity gradient — with a scan that provably touches every
    * cluster's high-level representatives, while the graph still does
    * what graphs are good at: crawling WITHIN the target region.
    * (This is the SPANN/DiskANN-partitioned posture: coarse routing
    * by scan or centroid, fine retrieval by graph.) */
  def searchBatchSeeded(vectors: DataFrame, adj: DataFrame, queries: DataFrame,
                        seedPool: DataFrame, seedWidth: Int, k: Int = 10,
                        sched: Seq[(Int, Int)]): DataFrame = {
    val emb = vectors.select(col("vec_id"), col("embedding"))
    def scored(cand: DataFrame): DataFrame =
      emb.join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("sim", dot(col("embedding"), col("q_emb")))
        .select("q_id", "vec_id", "sim")
    var beam = seedPool.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .withColumn("sim", dot(col("embedding"), col("q_emb")))
      .select("q_id", "vec_id", "sim")
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rk") <= seedWidth).drop("rk")
      .localCheckpoint()
    for ((l, e) <- sched) {
      val expand = adj.filter(col("lvl") === l)
        .join(broadcast(beam.select(col("q_id"), col("vec_id").as("src"))),
          Seq("src"))
        .select(col("q_id"), col("dst").as("vec_id")).distinct()
        .join(broadcast(beam.select("q_id", "vec_id")),
          Seq("q_id", "vec_id"), "left_anti")
      beam = beam.unionByName(scored(expand))
        .withColumn("rk", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id").asc)))
        .filter(col("rk") <= e).drop("rk")
        .localCheckpoint()
    }
    beam.withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "sim").orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------- gates

  private def embDouble(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def qvec(s: SparkSession, d: String, id: Long): Seq[Double] =
    embDouble(s, d).filter(col("vec_id") === id)
      .head().getSeq[Double](1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The full tier end-to-end on the fixture: bulk build + the
    // deterministic beam walk for query vec 0, top-10. Hash-exact:
    // levels, blocks, edges, schedule and every truncation replay in
    // the oracle's recursive CTE.
    "ann_hnsw_topk" -> ((s, d) => {
      val v = embDouble(s, d).persist()
      val adj = build(v).persist()
      val out = search(v, adj, qvec(s, d, 0))
      out
    }),
    // The flat-seeded batch posture end-to-end (query vec 1): seed =
    // top-8 of the level ≥ 2 union, then descend the SeededPlan. This
    // is the production shape for clustered corpora (PERF.md), so it
    // carries its own hash gate, not just a spec.
    "ann_hnsw_seeded" -> ((s, d) => {
      import s.implicits._
      val v = embDouble(s, d).persist()
      val adj = build(v).persist()
      val queries = Seq((0L, qvec(s, d, 1))).toDF("q_id", "q_emb")
      val pool = v.filter(levelCol(col("vec_id")) >= 2)
      searchBatchSeeded(v, adj, queries, pool, seedWidth = 8, k = 10,
          sched = SeededPlan)
        .select("rank", "vec_id", "sim")
    }),
    // CDC-DRIVEN GRAPH-INDEX MAINTENANCE (the x17 move for the graph
    // tier): build the directed graph WITHOUT the %9 cohort, then
    // insert the cohort via maintainDirected — O(churned blocks ×
    // occupancy) work — and emit the per-level full-graph digest. The
    // oracle replays the FULL-corpus graph from scratch: the gate
    // passes only if incremental maintenance is bit-for-bit equal to
    // a rebuild, which the block-locality argument guarantees and
    // this hash now enforces.
    "ann_hnsw_incremental" -> ((s, d) => {
      val v = embDouble(s, d).persist()
      val base = v.filter(col("vec_id") % 9 =!= 0)
      val added = v.filter(col("vec_id") % 9 === 0)
      val d0 = buildDirected(base).localCheckpoint()
      val d1 = maintainDirected(v, d0, added)
      symmetrize(d1).groupBy("lvl")
        .agg(countDistinct(col("src")).as("n_nodes"),
          count(lit(1)).as("n_edges"),
          md5(concat_ws("", array_sort(collect_list(
            concat(col("src").cast("string"), lit(":"),
              col("dst").cast("string")))))).as("edges_md5"))
        .orderBy("lvl")
    }),
    // Graph observability: per-level node/edge/degree stats — the
    // index-health readout (a level with degree ~0 is a broken ladder)
    // and a cheap full-replay cross-check of the builder.
    "ann_hnsw_stats" -> ((s, d) => {
      val v = embDouble(s, d)
      build(v).groupBy("lvl")
        .agg(countDistinct(col("src")).as("n_nodes"),
          count(lit(1)).as("n_edges"),
          max(col("src")).as("max_src"))
        .orderBy("lvl")
    })
  )

  // ---------------------------------------------------------------- oracle

  /** Shared SQL: levels + blocked symmetric kNN edges, mirroring
    * [[build]] (codeSql = the RP-LSH replay, same planes). */
  private def graphSql: String = {
    import graft.functions.RandomHyperplane.codeSql
    s"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |lvlt AS (SELECT vec_id, e, ${levelSql("vec_id")} AS nlvl,
       |  ${codeSql("e")} AS code FROM emb),
       |lvls AS (SELECT unnest([0, 1, 2, 3]) AS lvl),
       |nodes AS (
       |  SELECT l.lvl, c.vec_id, c.e,
       |    c.code % (1 << greatest($B0 - l.lvl, 0)) AS blk
       |  FROM lvls l JOIN lvlt c ON c.nlvl >= l.lvl),
       |aprobe AS (
       |  SELECT a.lvl, a.vec_id, a.e,
       |    CASE WHEN pp.p = 0 THEN a.blk
       |         ELSE xor(a.blk, 1 << (greatest($B0 - a.lvl, 0) - 1)) END AS pblk
       |  FROM nodes a JOIN (SELECT unnest([0, 1]) AS p) pp
       |    ON pp.p = 0 OR greatest($B0 - a.lvl, 0) >= 1),
       |dedges AS (
       |  SELECT lvl, src, dst FROM (
       |    SELECT a.lvl, a.vec_id AS src, b.vec_id AS dst,
       |      row_number() OVER (PARTITION BY a.lvl, a.vec_id
       |        ORDER BY list_inner_product(a.e, b.e) DESC, b.vec_id ASC) AS rk
       |    FROM aprobe a JOIN nodes b
       |      ON a.lvl = b.lvl AND a.pblk = b.blk AND a.vec_id <> b.vec_id)
       |  WHERE rk <= ${M}),
       |edges AS (SELECT DISTINCT lvl, src, dst FROM (
       |  SELECT lvl, src, dst FROM dedges
       |  UNION ALL SELECT lvl, dst AS src, src AS dst FROM dedges))""".stripMargin
  }

  /** The walk replayed list-packed (the pagerank technique): adjacency
    * packed per level as a list-of-lists indexed by vec_id, sims as
    * one list; each recursive step expands the beam through the level
    * the plan names and truncates by struct-sort on (-sim, id). The
    * step → (level, width) plan is emitted as two list literals FROM
    * THE SAME Scala schedule the engine executes, and `beamInitSql`
    * supplies the step-0 beam — a single entry node or a flat-seed
    * top-w list — so any walk shape replays without touching the CTE. */
  private def walkOracleSql(qVecId: Long, plan: Seq[(Int, Int)],
                            beamInitSql: String): String = {
    val lvlsLit = plan.map(_._1).mkString("[", ", ", "]")
    val widthsLit = plan.map(_._2).mkString("[", ", ", "]")
    s"""WITH RECURSIVE $graphSql,
       |q AS (SELECT e AS qe FROM emb WHERE vec_id = $qVecId),
       |adjl AS (SELECT lvl, src, list(dst ORDER BY dst) AS nbrs
       |         FROM edges GROUP BY lvl, src),
       |apack AS (
       |  SELECT l.lvl,
       |    list(COALESCE(a.nbrs, CAST([] AS BIGINT[])) ORDER BY d.vec_id)
       |      AS adj
       |  FROM lvls l CROSS JOIN emb d
       |  LEFT JOIN adjl a ON a.lvl = l.lvl AND a.src = d.vec_id
       |  GROUP BY l.lvl),
       |simsl AS (
       |  SELECT list(list_inner_product(e, (SELECT qe FROM q))
       |              ORDER BY vec_id) AS sim
       |  FROM emb),
       |entry AS (SELECT vec_id FROM lvlt ORDER BY nlvl DESC, vec_id ASC LIMIT 1),
       |walk AS (
       |  SELECT 0 AS step, ($beamInitSql) AS beam
       |  UNION ALL
       |  SELECT w.step + 1,
       |    list_transform(
       |      list_sort(list_transform(
       |        list_distinct(w.beam ||
       |          flatten(list_transform(w.beam, u -> ap.adj[u + 1]))),
       |        u -> {'s': -s.sim[u + 1], 'i': u}))
       |      [1 : ($widthsLit)[w.step + 1]],
       |      x -> x.i) AS beam
       |  FROM walk w
       |  JOIN apack ap ON ap.lvl = ($lvlsLit)[w.step + 1]
       |  CROSS JOIN simsl s
       |  WHERE w.step < ${plan.size}),
       |fin AS (SELECT unnest(beam) AS vec_id FROM walk
       |        WHERE step = ${plan.size})
       |SELECT row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank,
       |  vec_id, sim
       |FROM (SELECT f.vec_id,
       |        list_inner_product(e.e, (SELECT qe FROM q)) AS sim
       |      FROM fin f JOIN emb e ON e.vec_id = f.vec_id)
       |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "ann_hnsw_topk" -> walkOracleSql(0L,
      schedule(MaxLevel, Ef, EfUpper, Rounds0, 1),
      "[CAST((SELECT vec_id FROM entry) AS BIGINT)]"),
    // The flat-seeded posture under the oracle too: step-0 beam = the
    // top-8 by sim of the level ≥ 2 union (the deterministic 1/4 hash
    // sample), then the same recursive walk over the plan.
    "ann_hnsw_seeded" -> walkOracleSql(1L, SeededPlan,
      """(SELECT list(vec_id) FROM (
         |    SELECT c.vec_id FROM lvlt c, q
         |    WHERE c.nlvl >= 2
         |    ORDER BY list_inner_product(c.e, q.qe) DESC, c.vec_id ASC
         |    LIMIT 8) seedt)""".stripMargin),
    "ann_hnsw_stats" ->
      s"""WITH $graphSql
         |SELECT lvl, count(DISTINCT src) AS n_nodes, count(*) AS n_edges,
         |  max(src) AS max_src
         |FROM edges GROUP BY lvl ORDER BY lvl""".stripMargin,
    // Incremental == rebuild: the oracle is simply the FULL-corpus
    // graph replay — the engine side only ever computed the delta.
    "ann_hnsw_incremental" ->
      s"""WITH $graphSql
         |SELECT lvl, count(DISTINCT src) AS n_nodes, count(*) AS n_edges,
         |  md5(string_agg(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR),
         |      '' ORDER BY CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)))
         |    AS edges_md5
         |FROM edges GROUP BY lvl ORDER BY lvl""".stripMargin
  )
}
