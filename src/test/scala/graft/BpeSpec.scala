package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("mergeOnce is greedy left-to-right non-overlapping") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergeOnce(Seq("x", "a", "b", "y", "a", "b"), "a", "b") ==
      Seq("x", "ab", "y", "ab"))
    assert(Bpe.mergeOnce(Seq("a"), "a", "a") == Seq("a"))
  }

  test("train is deterministic and replaying its merges reproduces the vocab") {
    val docs = Tables.documents(spark, d).filter(col("n_chars") > 0)
    val (m1, f1) = Bpe.train(docs, 10)
    val (m2, f2) = Bpe.train(docs, 10)
    assert(m1 == m2, "training must be RNG-free deterministic")
    assert(m1.size == 10 && m1.map(_._1) == (1 to 10))
    // final segmentation == chars run through the merge list in rank order
    val fin = f1.select("w", "syms").as[(String, Seq[String])].collect().toMap
    fin.foreach { case (w, syms) =>
      val replayed = m1.foldLeft(w.map(_.toString): Seq[String]) {
        case (s, (_, l, r, _)) => Bpe.mergeOnce(s, l, r)
      }
      assert(syms == replayed, s"word $w: $syms != $replayed")
      assert(syms.mkString("") == w, s"segmentation must concatenate back to $w")
    }
    f1.unpersist(); f2.unpersist()
  }

  test("encodeWord generalizes: unseen words reuse learned subwords") {
    val docs = Tables.documents(spark, d).filter(col("n_chars") > 0)
    val (merges, fin) = Bpe.train(docs, 20)
    // a word the trainer never saw, built from seen material
    val syms = Bpe.encodeWord("joinhash", merges)
    assert(syms.mkString("") == "joinhash")
    // the learned 'join' and 'hash' merges fire inside the OOV word
    assert(syms.length < "joinhash".length,
      s"no merges fired on an in-distribution OOV word: $syms")
    // unseen characters stay single symbols, never crash
    assert(Bpe.encodeWord("zq9", merges).mkString("") == "zq9")
  }

  test("encode compresses: n_words <= n_bpe_tokens <= total chars") {
    val rows = SparkEntry.queries("ts_bpe_encode")(spark, d)
      .join(Tables.documents(spark, d).select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars_nospace")),
        Seq("doc_id"))
      .select("n_words", "n_bpe_tokens", "n_chars_nospace")
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nw, nb, nc) =>
      assert(nw <= nb && nb <= nc, s"($nw, $nb, $nc) violates bounds")
    }
    // merges actually fired: strictly fewer bpe tokens than chars overall
    assert(rows.map(_._2).sum < rows.map(_._3.toLong).sum)
  }

  test("wordpiece: likelihood argmax diverges from BPE's count argmax") {
    val docs = Tables.documents(spark, d).filter(col("n_chars") > 0)
    val wp = Bpe.trainWordPiece(docs, 3)
    spark.catalog.clearCache()
    // independently-computed reference for this fixed corpus (same
    // values the DuckDB oracle reproduces)
    assert(wp.map(m => (m._1, m._2, m._3, m._4)) ==
      Seq((1, "q", "u", 934L), (2, "i", "n", 2858L), (3, "f", "i", 917L)))
    wp.foreach(m => assert(m._5 > 0.0 && m._5 < 1.0))
    // BPE picks the highest-COUNT pair first; WordPiece demotes pairs
    // of individually-common symbols — on this corpus the two criteria
    // observably choose different first merges
    val (bpe, _) = Bpe.train(docs, 1)
    spark.catalog.clearCache()
    assert((bpe.head._2, bpe.head._3) != (wp.head._2, wp.head._3),
      s"expected BPE ${(bpe.head._2, bpe.head._3)} to differ from WordPiece (q,u)")
    assert(wp.head._2 == "q" && wp.head._3 == "u")
  }

  test("viterbi: optimal vs brute-force enumeration, lossless, smallest-split ties") {
    // deterministic pseudo-random inventory over a 4-letter alphabet
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(60)(Seq.fill(2 + rnd.nextInt(9))(
      ('a' + rnd.nextInt(4)).toChar).mkString)
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap(n =>
        allSegs(w.drop(n)).map(w.take(n) +: _))
    for (trial <- 0 until 5) {
      val chars = "abcd".map(_.toString)
      val multi = Seq.fill(12)(Seq.fill(2 + rnd.nextInt(3))(
        ('a' + rnd.nextInt(4)).toChar).mkString).distinct
      val inv: Map[String, Long] =
        (chars.map(c => c -> (4096L + rnd.nextInt(4095))) ++
          multi.map(p => p -> (p.length.toLong * p.length * 4096 + rnd.nextInt(4095)))).toMap
      words.foreach { w =>
        val (segs, sc) = Bpe.viterbi(w, inv)
        // lossless: pieces concatenate back to the word
        assert(segs.mkString == w)
        // every piece is in the inventory and total matches
        assert(segs.forall(inv.contains) && segs.map(inv).sum == sc)
        // optimal: equals the brute-force max over all segmentations
        val best = allSegs(w).filter(_.forall(inv.contains)).map(_.map(inv).sum).max
        assert(sc == best, s"$w: viterbi $sc vs brute $best")
      }
    }
  }

  test("ts_unigram_segment: frequent whole words survive, rare words shatter") {
    val rows = SparkEntry.queries("ts_unigram_segment")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { case (w, n, seg, sc) =>
      assert(seg.split('|').mkString == w, s"$w segmentation not lossless: $seg")
      assert(n == seg.split('|').length && sc > 0)
    }
    // determinism
    val again = SparkEntry.queries("ts_unigram_segment")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(rows.sameElements(again))
  }
}
