package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016) —
  * the "BPE-ish" tier of the text-analysis family (SURVEY §2.8's
  * token counting runs whitespace + regex; this LEARNS the subword
  * vocabulary from the corpus and tokenizes with it).
  *
  * Distributed shape: the word-frequency vocabulary is a DataFrame
  * (at 100 TB it has millions of rows and never collects); each merge
  * iteration is ONE explode+groupBy shuffle over the vocabulary to
  * count adjacent symbol pairs, an argmax of that tiny aggregate
  * pulled to the driver (one row), and a narrow map applying the
  * merge. Training cost is nMerges shuffles over the VOCAB (not the
  * corpus — the corpus is read once for frequencies); production
  * trainers at larger vocab counts batch several merges per count
  * pass, same loop skeleton.
  *
  * Everything is integer/string arithmetic — pair counts are
  * freq-weighted BIGINTs, the argmax tie-break is lexicographic on
  * "left|right" — so the oracle replays training EXACTLY: a
  * recursive CTE carries the whole (tiny) vocabulary as one list-
  * packed state row per iteration, extracts pair counts with list
  * lambdas, and applies the merge with the same greedy left-to-right
  * non-overlapping semantics (String.replace == DuckDB replace on a
  * "{sym}{sym}" wrapped encoding).
  */
object Bpe {

  /** Greedy left-to-right single-pair merge — the same non-overlapping
    * scan `String.replace` performs: [a,a,a] under (a,a) → [aa,a]. */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Word-frequency vocabulary of a (doc_id, text) relation. */
  private def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Train `nMerges` BPE merges. Returns the ranked merge table and
    * the final per-word segmentation (w, f, syms). */
  def train(docs: DataFrame, nMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // localCheckpoint (not persist): each iteration stacks a merge map
    // on the previous plan, and 20 stacked iterations make the LOGICAL
    // plan itself explode (AQE's explainString OOMed the driver before
    // any task ran) — the same lineage-control problem the star-
    // contraction components loop hits, same fix. Checkpoint blocks
    // are vocab-sized (distinct words, not the corpus) and are freed
    // by the ContextCleaner when superseded snapshots are GC'd.
    // r17 note: a coalesce(1) before the checkpoints was tried to make
    // the per-merge argmax exchange-free (SinglePartition satisfies the
    // aggregation's required distribution) and MEASURED a no-op — jobs
    // 52→52: localCheckpoint under AQE drops the child's output
    // partitioning (LogicalRDD records UnknownPartitioning), so the
    // exchange stays. Reverted; the 20 sequential argmax collects are
    // the algorithm's irreducible driver loop.
    var cur = vocab(docs)
      .withColumn("syms", transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
      .localCheckpoint(true)
    // the oracle's {sym}{sym} / "l|r" string encodings require tokens
    // free of the three delimiter characters — fail loudly rather than
    // silently diverging from the SQL replay on a hostile corpus (the
    // Scala side itself would handle them fine). Checked on the
    // already-materialized vocab, so it costs a vocab-sized scan.
    require(cur.filter(col("w").rlike("[{}|]")).limit(1).count() == 0,
      "BPE oracle parity requires tokens free of '{', '}', '|'")
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = cur.filter(size(col("syms")) >= 2)
        .select(col("f"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, concat(col("l"), lit("|"), col("r")).asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val mergeUdf = udf((syms: Seq[String]) => mergeOnce(syms, l, r))
        // checkpoint every 4th merge, not every merge (optimization
        // r16, guide §1.2): the eager localCheckpoint is one extra
        // Spark job per iteration, and the lineage-explosion guard it
        // exists for only needs the plan depth BOUNDED — ≤3 stacked
        // merge UDFs over the vocab-sized relation re-run for pennies
        // in the next argmax, while 20 unbounded layers OOMed AQE's
        // explainString (the original incident). Halves the trainer's
        // job count; merges and segmentation are unchanged.
        cur = cur.withColumn("syms", mergeUdf(col("syms")))
        if (rank % 4 == 0 || rank == nMerges) cur = cur.localCheckpoint(true)
        rank += 1
      }
    }
    (merges.toSeq, cur)
  }

  private val NMerges = 20

  /** Train `nMerges` WordPiece merges (Schuster & Nakajima 2012; the
    * BERT tokenizer's selection rule): same greedy loop as BPE but the
    * argmax maximizes LIKELIHOOD GAIN score = count(l,r) /
    * (count(l)·count(r)) — merging the pair whose co-occurrence is
    * most surprising given its parts, not merely the most frequent.
    * Each iteration adds ONE extra vocab-sized shuffle vs BPE (the
    * per-symbol frequency aggregation); the argmax stays a single
    * collected row and the double division is one IEEE op sequence
    * (c / (fl·fr), all operands exact integers), so the score itself
    * replays bit-exactly in the SQL oracle. */
  def trainWordPiece(docs: DataFrame,
                     nMerges: Int): Seq[(Int, String, String, Long, Double)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Double)]
    var cur = vocab(docs)
      .withColumn("syms", transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
      .localCheckpoint(true)
    require(cur.filter(col("w").rlike("[{}|]")).limit(1).count() == 0,
      "WordPiece oracle parity requires tokens free of '{', '}', '|'")
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = cur.filter(size(col("syms")) >= 2)
        .select(col("f"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("c"))
      val symFreq = cur
        .select(col("f"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum(col("f")).as("sf"))
      val best = pairs
        .join(symFreq.select(col("sym").as("l"), col("sf").as("fl")), Seq("l"))
        .join(symFreq.select(col("sym").as("r"), col("sf").as("fr")), Seq("r"))
        .withColumn("score", col("c").cast("double") /
          (col("fl").cast("double") * col("fr").cast("double")))
        .orderBy(col("score").desc, concat(col("l"), lit("|"), col("r")).asc)
        .limit(1).select("l", "r", "c", "score").collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c, sc) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2), best(0).getDouble(3))
        merges += ((rank, l, r, c, sc))
        val mergeUdf = udf((syms: Seq[String]) => mergeOnce(syms, l, r))
        // every-4th checkpoint cadence — same rationale as [[train]]
        cur = cur.withColumn("syms", mergeUdf(col("syms")))
        if (rank % 4 == 0 || rank == nMerges) cur = cur.localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize an arbitrary (possibly unseen) word with a trained merge
    * list: start from characters, apply every merge in rank order with
    * the same greedy scan — the standard BPE inference rule. */
  def encodeWord(w: String, merges: Seq[(Int, String, String, Long)]): Seq[String] =
    merges.sortBy(_._1).foldLeft(w.map(_.toString): Seq[String]) {
      case (s, (_, l, r, _)) => mergeOnce(s, l, r)
    }

  /** Max learned piece length for the unigram segmenter. */
  private val MaxPiece = 4

  /** Viterbi segmentation under an integer-scored piece inventory —
    * the unigram-LM tokenizer's inference rule (Kudo 2018,
    * SentencePiece; public arXiv 1804.10959). best(i) = max over
    * split points j of best(j) + score(w[j..i)); the FIRST strict
    * maximum wins, so ties pick the smallest j — exactly the oracle's
    * first-occurrence `list_position(cands, max)`. Single-character
    * pieces are always in the inventory, so every position is
    * reachable. All-integer scores keep the DP bit-exact
    * cross-engine. */
  private[graft] def viterbi(w: String, inv: Map[String, Long]): (Seq[String], Long) = {
    val L = w.length
    val best = Array.fill(L + 1)(Long.MinValue)
    val back = Array.fill(L + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        inv.get(w.substring(j, i)) match {
          case Some(sc) if best(j) != Long.MinValue && best(j) + sc > best(i) =>
            best(i) = best(j) + sc; back(i) = j
          case _ => ()
        }
        j += 1
      }
      i += 1
    }
    val segs = scala.collection.mutable.ListBuffer.empty[String]
    var pos = L
    while (pos > 0) { val j = back(pos); segs.prepend(w.substring(j, pos)); pos = j }
    (segs.toList, best(L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // OOV generalization: words the trainer never saw (adjacent token
    // pairs concatenated) segmented by rank-ordered merge application.
    // Every output row pins the full segmentation of an unseen word.
    "ts_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
      val (merges, fin) = train(docs, NMerges)
      val bc = s.sparkContext.broadcast(merges)
      val encUdf = udf((w: String) => encodeWord(w, bc.value))
      val toks = TextAnalysis.tokens(col("text"))
      docs.filter(size(toks) >= 2)
        .select(concat(element_at(toks, 1), element_at(toks, 2)).as("w"))
        .distinct()
        .withColumn("syms", encUdf(col("w")))
        .select(col("w"), size(col("syms")).cast("long").as("n_syms"),
          array_join(col("syms"), "|").as("seg"))
        .orderBy("w")
    }),
    // The WordPiece merge table — every row pins one iteration's
    // likelihood-gain argmax (score DESC, "l|r" ASC tie-break),
    // count AND score (the exact double) both gated.
    "ts_wordpiece_train" -> ((s, d) => {
      val merges = trainWordPiece(
        Tables.documents(s, d).filter(col("n_chars") > 0), NMerges)
      import s.implicits._
      merges.toDF("rank", "mleft", "mright", "cnt", "score")
        .select(col("rank"), col("mleft"), col("mright"),
          concat(col("mleft"), col("mright")).as("merged"),
          col("cnt"), col("score"))
        .orderBy("rank")
    }),

    // The learned merge table, rank by rank — every row pins one
    // training iteration's freq-weighted argmax (count DESC,
    // "l|r" ASC tie-break).
    "ts_bpe_train" -> ((s, d) => {
      val (merges, fin) = train(Tables.documents(s, d).filter(col("n_chars") > 0), NMerges)
      import s.implicits._
      merges.toDF("rank", "mleft", "mright", "cnt")
        .select(col("rank"), col("mleft"), col("mright"),
          concat(col("mleft"), col("mright")).as("merged"), col("cnt"))
        .orderBy("rank")
    }),

    // Tokenize the corpus with the learned vocabulary: per-doc word
    // count, BPE token count, and a digest of the full ordered
    // segmentation ("sym|sym" per word, space-joined in doc order).
    "ts_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
      val (_, fin) = train(docs, NMerges)
      val segs = fin.select(col("w"), size(col("syms")).cast("long").as("n_syms"),
        array_join(col("syms"), "|").as("seg"))
      val toks = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
      val out = toks.join(segs, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_syms")).as("n_bpe_tokens"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")), " ")).as("seg_digest"))
        .orderBy("doc_id")
      out
    }),

    // Unigram-LM segmentation (the third classic subword algorithm
    // next to BPE and WordPiece): an integer-scored piece inventory —
    // every character, plus the 64 highest-frequency substrings of
    // length 2..4 (freq-weighted over the word vocabulary) — and
    // Viterbi DP per word maximizing Σ len(p)²·4096 + min(count, 4095)
    // (the quadratic length term plays log-probability's role of
    // favoring fewer, longer pieces; the capped count bonus breaks
    // ties toward frequent pieces; all integers so the DP replays
    // bit-exactly). Scale shape: the inventory is BOUNDED (alphabet +
    // 64 rows — collected and broadcast like the BM25 stats), the
    // substring counting is one explode+groupBy over the VOCABULARY
    // (not the corpus), and segmentation is a map-only UDF walk over
    // the top-400 word relation. The oracle replays the whole DP as a
    // 12-iteration recursive CTE (bests+backpointer lists per word)
    // and a backpointer-walk reconstruction CTE.
    "ts_unigram_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
      val voc = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f")).persist()
      val pieces = (2 to MaxPiece).map { n =>
        voc.filter(length(col("w")) >= n)
          .select(col("f"), explode(transform(
            sequence(lit(1), length(col("w")) - (n - 1)),
            i => col("w").substr(i, lit(n)))).as("p"))
      }.reduce(_ union _)
        .groupBy("p").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc).limit(64)
      val chars = voc
        .select(col("f"), explode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as("p"))
        .groupBy("p").agg(sum(col("f")).as("cnt"))
      val inv = chars.union(pieces)
        .withColumn("sc", (length(col("p")) * length(col("p")) * lit(4096L))
          + least(col("cnt"), lit(4095L)))
        .select("p", "sc").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bc = s.sparkContext.broadcast(inv)
      val segUdf = udf((w: String) => {
        val (segs, sc) = viterbi(w, bc.value)
        (segs.mkString("|"), segs.length.toLong, sc)
      })
      voc.filter(length(col("w")).between(2, 12))
        .orderBy(col("f").desc, col("w").asc).limit(400)
        .withColumn("r", segUdf(col("w")))
        .select(col("w"), col("r._2").as("n_pieces"), col("r._1").as("seg"),
          col("r._3").as("total_score"))
        .orderBy("w")
    })
  )

  /** The training replay: one recursive CTE whose state row packs the
    * whole vocabulary (list of (w, f, enc)) plus the merge list; each
    * iteration derives pair counts with list lambdas (the
    * `list_transform([x], v -> …)[1]` let-binding idiom) and applies
    * the winning merge via `replace` on the "{sym}{sym}" encoding —
    * greedy left-to-right non-overlapping, exactly `mergeOnce`. */
  private def bpeCte(nMerges: Int): String =
    s"""words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM documents WHERE n_chars > 0) GROUP BY w),
       |winit AS (
       |  SELECT w, f,
       |    array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> '{' || w[i] || '}'), '') AS enc
       |  FROM words),
       |bpe AS (
       |  SELECT 0 AS it,
       |    list(struct_pack(w := w, f := f, enc := enc) ORDER BY w) AS st,
       |    CAST([] AS STRUCT(l VARCHAR, r VARCHAR, c BIGINT)[]) AS merges
       |  FROM winit
       |  UNION ALL
       |  SELECT it + 1,
       |    list_transform(st, s -> struct_pack(w := s.w, f := s.f,
       |      enc := replace(s.enc, '{' || best.l || '}{' || best.r || '}',
       |                     '{' || best.l || best.r || '}'))),
       |    list_append(merges, best)
       |  FROM (
       |    SELECT it, st, merges,
       |      list_transform([
       |        flatten(list_transform(st, s ->
       |          list_transform([string_split(trim(s.enc, '{}'), '}{')], sy ->
       |            list_transform(range(1, len(sy)),
       |              i -> struct_pack(p := sy[i] || '|' || sy[i+1],
       |                               f := s.f)))[1]))
       |      ], pa ->
       |        list_transform([
       |          list_transform(list_distinct(list_transform(pa, x -> x.p)), p ->
       |            struct_pack(p := p,
       |              c := CAST(list_sum(list_transform(
       |                     list_filter(pa, x -> x.p = p), x -> x.f)) AS BIGINT)))
       |        ], pc ->
       |          list_transform([
       |            list_sort(list_transform(list_filter(pc,
       |              x -> x.c = list_aggregate(list_transform(pc, y -> y.c), 'max')),
       |              x -> x.p))[1]
       |          ], bp ->
       |            struct_pack(l := string_split(bp, '|')[1],
       |                        r := string_split(bp, '|')[2],
       |                        c := list_filter(pc, x -> x.p = bp)[1].c))[1])[1])[1]
       |      AS best
       |    FROM bpe WHERE it < $nMerges)
       |  WHERE best.c IS NOT NULL)""".stripMargin

  /** WordPiece training replay: the bpeCte skeleton with two more
    * let-bound lists per iteration — `sa` (weighted symbol
    * occurrences) and `sfr` (per-symbol totals) — and the argmax over
    * score = c / (fl·fr), the same IEEE double op sequence the engine
    * computes, so even the score column hash-matches. */
  private def wpCte(nMerges: Int): String =
    s"""words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM documents WHERE n_chars > 0) GROUP BY w),
       |winit AS (
       |  SELECT w, f,
       |    array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> '{' || w[i] || '}'), '') AS enc
       |  FROM words),
       |wp AS (
       |  SELECT 0 AS it,
       |    list(struct_pack(w := w, f := f, enc := enc) ORDER BY w) AS st,
       |    CAST([] AS STRUCT(l VARCHAR, r VARCHAR, c BIGINT, score DOUBLE)[]) AS merges
       |  FROM winit
       |  UNION ALL
       |  SELECT it + 1,
       |    list_transform(st, s -> struct_pack(w := s.w, f := s.f,
       |      enc := replace(s.enc, '{' || best.l || '}{' || best.r || '}',
       |                     '{' || best.l || best.r || '}'))),
       |    list_append(merges, best)
       |  FROM (
       |    SELECT it, st, merges,
       |      list_transform([
       |        flatten(list_transform(st, s ->
       |          list_transform([string_split(trim(s.enc, '{}'), '}{')], sy ->
       |            list_transform(range(1, len(sy)),
       |              i -> struct_pack(p := sy[i] || '|' || sy[i+1],
       |                               f := s.f)))[1]))
       |      ], pa ->
       |        list_transform([
       |          flatten(list_transform(st, s ->
       |            list_transform([string_split(trim(s.enc, '{}'), '}{')], sy ->
       |              list_transform(range(1, len(sy) + 1),
       |                i -> struct_pack(sym := sy[i], f := s.f)))[1]))
       |        ], sa ->
       |          list_transform([
       |            list_transform(list_distinct(list_transform(sa, x -> x.sym)), sym ->
       |              struct_pack(sym := sym,
       |                sf := CAST(list_sum(list_transform(
       |                       list_filter(sa, x -> x.sym = sym), x -> x.f)) AS BIGINT)))
       |          ], sfr ->
       |            list_transform([
       |              list_transform(list_distinct(list_transform(pa, x -> x.p)), p ->
       |                struct_pack(p := p,
       |                  c := CAST(list_sum(list_transform(
       |                         list_filter(pa, x -> x.p = p), x -> x.f)) AS BIGINT)))
       |            ], pc ->
       |              list_transform([
       |                list_transform(pc, x -> struct_pack(p := x.p, c := x.c,
       |                  score := CAST(x.c AS DOUBLE) /
       |                    (CAST(list_filter(sfr, y -> y.sym = string_split(x.p, '|')[1])[1].sf AS DOUBLE)
       |                     * CAST(list_filter(sfr, y -> y.sym = string_split(x.p, '|')[2])[1].sf AS DOUBLE))))
       |              ], sco ->
       |                list_transform([
       |                  list_sort(list_transform(list_filter(sco,
       |                    x -> x.score = list_aggregate(list_transform(sco, y -> y.score), 'max')),
       |                    x -> x.p))[1]
       |                ], bp ->
       |                  struct_pack(l := string_split(bp, '|')[1],
       |                              r := string_split(bp, '|')[2],
       |                              c := list_filter(sco, x -> x.p = bp)[1].c,
       |                              score := list_filter(sco, x -> x.p = bp)[1].score))[1]
       |              )[1])[1])[1])[1])[1]
       |      AS best
       |    FROM wp WHERE it < $nMerges)
       |  WHERE best.c IS NOT NULL)""".stripMargin

  val oracles: Map[String, String] = Map(
    // The whole Viterbi DP replayed: bests+backpointer lists grow one
    // position per recursion round (12 = the word-length cap), the
    // argmax is first-occurrence list_position (ties → smallest split
    // point, Scala's strictly-greater rule), and a second recursive
    // CTE walks the backpointers to reconstruct the segmentation.
    "ts_unigram_segment" ->
      s"""WITH RECURSIVE uvoc AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
         |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
         |    FROM documents WHERE n_chars > 0) GROUP BY w),
         |upc AS (
         |  SELECT p, CAST(sum(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, unnest(list_concat(list_concat(
         |      CASE WHEN length(w) >= 2 THEN list_transform(generate_series(1, length(w)-1), i -> substr(w, i, 2)) ELSE [] END,
         |      CASE WHEN length(w) >= 3 THEN list_transform(generate_series(1, length(w)-2), i -> substr(w, i, 3)) ELSE [] END),
         |      CASE WHEN length(w) >= 4 THEN list_transform(generate_series(1, length(w)-3), i -> substr(w, i, 4)) ELSE [] END)) AS p
         |    FROM uvoc)
         |  GROUP BY p ORDER BY cnt DESC, p ASC LIMIT 64),
         |uch AS (
         |  SELECT p, CAST(sum(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, unnest(list_transform(generate_series(1, length(w)), i -> substr(w, i, 1))) AS p
         |    FROM uvoc) GROUP BY p),
         |uinv AS (
         |  SELECT p, CAST(length(p)*length(p)*4096 + least(cnt, 4095) AS BIGINT) AS sc FROM uch
         |  UNION ALL
         |  SELECT p, CAST(length(p)*length(p)*4096 + least(cnt, 4095) AS BIGINT) AS sc FROM upc),
         |upack AS (SELECT list(p ORDER BY p) AS ps, list(sc ORDER BY p) AS scs FROM uinv),
         |uw AS (SELECT w FROM uvoc WHERE length(w) BETWEEN 2 AND 12
         |       ORDER BY f DESC, w ASC LIMIT 400),
         |udp AS (
         |  SELECT 0 AS it, w, [CAST(0 AS BIGINT)] AS bests, [CAST(-1 AS BIGINT)] AS backs FROM uw
         |  UNION ALL
         |  SELECT it + 1, w,
         |    CASE WHEN it + 1 > length(w) THEN bests
         |         ELSE list_append(bests, list_aggregate(cands, 'max')) END,
         |    CASE WHEN it + 1 > length(w) THEN backs
         |         ELSE list_append(backs, CAST(lo - 1 + list_position(cands,
         |                list_aggregate(cands, 'max')) AS BIGINT)) END
         |  FROM (
         |    SELECT u.it, u.w, u.bests, u.backs, greatest(0, u.it + 1 - 4) AS lo,
         |      list_transform(generate_series(greatest(0, u.it + 1 - 4), u.it),
         |        j -> CASE WHEN list_position(p.ps, substr(u.w, CAST(j + 1 AS INT), CAST(u.it + 1 - j AS INT))) > 0
         |             THEN u.bests[j + 1] + p.scs[list_position(p.ps, substr(u.w, CAST(j + 1 AS INT), CAST(u.it + 1 - j AS INT)))]
         |             END) AS cands
         |    FROM udp u, upack p WHERE u.it < 12)),
         |useg AS (
         |  SELECT w, CAST(length(w) AS BIGINT) AS pos, CAST(NULL AS VARCHAR) AS piece, backs
         |  FROM udp WHERE it = 12
         |  UNION ALL
         |  SELECT w, backs[pos + 1],
         |    substr(w, CAST(backs[pos + 1] AS INT) + 1, CAST(pos - backs[pos + 1] AS INT)), backs
         |  FROM useg WHERE pos > 0)
         |SELECT s.w, CAST(count(s.piece) AS BIGINT) AS n_pieces,
         |  string_agg(s.piece, '|' ORDER BY s.pos ASC) AS seg,
         |  any_value(d.bests[length(s.w) + 1]) AS total_score
         |FROM useg s JOIN udp d ON d.w = s.w AND d.it = 12
         |GROUP BY s.w ORDER BY s.w""".stripMargin,
    "ts_wordpiece_train" ->
      s"""WITH RECURSIVE ${wpCte(NMerges)}
         |SELECT i AS rank, m[i].l AS mleft, m[i].r AS mright,
         |  m[i].l || m[i].r AS merged, m[i].c AS cnt, m[i].score AS score
         |FROM (SELECT merges AS m FROM wp WHERE it = (SELECT max(it) FROM wp)),
         |LATERAL (SELECT unnest(generate_series(1, len(m))) AS i)
         |ORDER BY rank""".stripMargin,
    // a second recursive CTE replays INFERENCE: the unseen-word list
    // starts at characters and applies merge #(it+1) from the trained
    // list at each step — the same replace-on-{sym}{sym} greedy rule.
    "ts_bpe_apply" ->
      s"""WITH RECURSIVE ${bpeCte(NMerges)},
         |unseen AS (
         |  SELECT DISTINCT tk[1] || tk[2] AS w
         |  FROM (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |        FROM documents WHERE n_chars > 0)
         |  WHERE len(tk) >= 2),
         |uinit AS (
         |  SELECT w, array_to_string(list_transform(range(1, length(w) + 1),
         |    i -> '{' || w[i] || '}'), '') AS enc
         |  FROM unseen),
         |app AS (
         |  SELECT 0 AS it, list(struct_pack(w := w, enc := enc) ORDER BY w) AS ws
         |  FROM uinit
         |  UNION ALL
         |  SELECT a.it + 1,
         |    list_transform(a.ws, s -> struct_pack(w := s.w,
         |      enc := replace(s.enc,
         |        '{' || b.merges[a.it + 1].l || '}{' || b.merges[a.it + 1].r || '}',
         |        '{' || b.merges[a.it + 1].l || b.merges[a.it + 1].r || '}')))
         |  FROM app a, (SELECT merges FROM bpe WHERE it = (SELECT max(it) FROM bpe)) b
         |  WHERE a.it < len(b.merges))
         |SELECT u.s.w AS w,
         |  CAST(len(string_split(trim(u.s.enc, '{}'), '}{')) AS BIGINT) AS n_syms,
         |  array_to_string(string_split(trim(u.s.enc, '{}'), '}{'), '|') AS seg
         |FROM (SELECT unnest(ws) AS s FROM app WHERE it = (SELECT max(it) FROM app)) u
         |ORDER BY w""".stripMargin,

    "ts_bpe_train" ->
      s"""WITH RECURSIVE ${bpeCte(NMerges)}
         |SELECT i AS rank, m[i].l AS mleft, m[i].r AS mright,
         |  m[i].l || m[i].r AS merged, m[i].c AS cnt
         |FROM (SELECT merges AS m FROM bpe WHERE it = (SELECT max(it) FROM bpe)),
         |LATERAL (SELECT unnest(generate_series(1, len(m))) AS i)
         |ORDER BY rank""".stripMargin,

    "ts_bpe_encode" ->
      s"""WITH RECURSIVE ${bpeCte(NMerges)},
         |fin AS (
         |  SELECT u.s.w AS w,
         |    CAST(len(string_split(trim(u.s.enc, '{}'), '}{')) AS BIGINT) AS n_syms,
         |    array_to_string(string_split(trim(u.s.enc, '{}'), '}{'), '|') AS seg
         |  FROM (SELECT unnest(st) AS s FROM bpe WHERE it = (SELECT max(it) FROM bpe)) u),
         |toks AS (
         |  SELECT doc_id, i - 1 AS pos, tk[i] AS w
         |  FROM (SELECT doc_id,
         |          list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |        FROM documents WHERE n_chars > 0),
         |  LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i))
         |SELECT t.doc_id, count(*) AS n_words,
         |  CAST(sum(f.n_syms) AS BIGINT) AS n_bpe_tokens,
         |  md5(string_agg(f.seg, ' ' ORDER BY t.pos)) AS seg_digest
         |FROM toks t JOIN fin f ON f.w = t.w
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  )
}
