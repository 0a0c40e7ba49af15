package graft

/** Throwaway driver-side experiment: does Malkov's diversity-heuristic
  * neighbor selection fix the kNN-graph cliquing that stalls the beam
  * walk on the clustered corpus? Pure JVM, 50k subsample, no Spark. */
object HnswLocal {
  val Dim = 768

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < Dim) { s += a(j) * b(j); j += 1 }
    s
  }

  def main(args: Array[String]): Unit = {
    val N = 50000
    val maxLevel = 10 // log2(50k/50)
    val b0 = 10
    val M = 8
    def cluVec(id: Long): Array[Double] = {
      val c = BenchVec.hashUnitVec(9000000L + id % 1024, Dim)
      val n = BenchVec.hashUnitVec(4000000L + id, Dim)
      val v = Array.tabulate(Dim)(j => c(j) + 0.6 * n(j))
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nn)
    }
    // ids 0..N-1 map to bench vec_ids: use id directly as generator seed
    val emb = new Array[Array[Double]](N)
    java.util.stream.IntStream.range(0, N).parallel()
      .forEach(i => emb(i) = cluVec(i.toLong))
    println("emb built")
    val planes = Array.tabulate(b0)(p => BenchVec.hashUnitVec(7200000L + p, Dim))
    val code = new Array[Int](N)
    java.util.stream.IntStream.range(0, N).parallel().forEach { i =>
      var c = 0
      for (p <- 0 until b0) if (dot(emb(i), planes(p)) >= 0.0) c |= (1 << p)
      code(i) = c
    }
    def lvlOf(id: Long): Int = {
      val g = ((id + 7L) * 2860486313L) >> 16
      var l = 0
      while (l < maxLevel && (g % (1L << (l + 1))) != (1L << l)) l += 1
      l
    }
    val nlvl = Array.tabulate(N)(i => lvlOf(i.toLong))

    // build per level: candidates = block + sibling; neighbors kept by
    // either plain top-M or the diversity heuristic
    def buildLevel(l: Int, heuristic: Boolean): Map[Int, Array[Int]] = {
      val bits = math.max(b0 - l, 0)
      val nodes = (0 until N).filter(nlvl(_) >= l)
      val byBlk = nodes.groupBy(i => code(i) & ((1 << bits) - 1))
      val out = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
      val blkArr = byBlk.keys.toArray
      java.util.stream.IntStream.range(0, blkArr.length).parallel().forEach { bi =>
        val blk = blkArr(bi)
        val own = byBlk.getOrElse(blk, Seq.empty)
        val sib = if (bits == 0) Seq.empty
          else byBlk.getOrElse(blk ^ (1 << (bits - 1)), Seq.empty)
        val cands = (own ++ sib).toArray
        for (src <- own) {
          val scored = cands.filter(_ != src)
            .map(d => (d, dot(emb(src), emb(d))))
            .sortBy { case (d, s) => (-s, d) }
          val kept =
            if (!heuristic) scored.take(M).map(_._1)
            else {
              val acc = scala.collection.mutable.ArrayBuffer.empty[Int]
              var i = 0
              while (acc.size < M && i < scored.length) {
                val (c, simCS) = scored(i)
                if (acc.forall(k => simCS > dot(emb(c), emb(k)))) acc += c
                i += 1
              }
              acc.toArray
            }
          out.put(src * 32 + l, kept)
        }
      }
      // symmetrize
      val sym = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[Int]]
      for (src <- nodes; d <- out.getOrDefault(src * 32 + l, Array.empty)) {
        sym.getOrElseUpdate(src, scala.collection.mutable.Set.empty) += d
        sym.getOrElseUpdate(d, scala.collection.mutable.Set.empty) += src
      }
      sym.map { case (k, v) => k -> v.toArray.sorted }.toMap
    }

    def walk(adj: Array[Map[Int, Array[Int]]], q: Array[Double],
             ef: Int, efU: Int, r0: Int, ru: Int): Seq[Int] = {
      val entry = (0 until N).maxBy(i => (nlvl(i), -i))
      var beam = Seq(entry)
      val sched = (maxLevel to 1 by -1).flatMap(l => Seq.fill(ru)((l, efU))) ++
        Seq.fill(r0)((0, ef))
      for ((l, e) <- sched) {
        val cand = (beam ++ beam.flatMap(adj(l).getOrElse(_, Array.empty[Int])))
          .distinct
        beam = cand.map(i => (i, dot(emb(i), q))).sortBy { case (i, s) => (-s, i) }
          .take(e).map(_._1)
      }
      beam
    }

    def qv(i: Int): Array[Double] = {
      val t = cluVec(8000L * i % N) // targets inside the subsample
      val noise = BenchVec.hashUnitVec(3100000L + i, Dim)
      val v = Array.tabulate(Dim)(j => t(j) + 0.5 * noise(j))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val NQ = 8
    val brute = (0 until NQ).map { i =>
      val q = qv(i)
      (0 until N).map(j => (j, dot(emb(j), q))).sortBy { case (j, s) => (-s, j) }
        .take(10).map(_._1).toSet
    }
    // wide-upper walk: width is a function of level — stay wide until
    // the level where each latent cluster still has a representative,
    // then narrow. Tracks visited-candidate count (the compute story).
    def walkW(adj: Array[Map[Int, Array[Int]]], q: Array[Double],
              width: Int => Int, r0: Int): (Seq[Int], Int) = {
      val entry = (0 until N).maxBy(i => (nlvl(i), -i))
      var beam = Seq(entry)
      var visited = 0
      val sched = (maxLevel to 1 by -1).map(l => (l, width(l))) ++
        Seq.fill(r0)((0, width(0)))
      for ((l, e) <- sched) {
        val cand = (beam ++ beam.flatMap(adj(l).getOrElse(_, Array.empty[Int])))
          .distinct
        visited += cand.size
        beam = cand.map(i => (i, dot(emb(i), q))).sortBy { case (i, s) => (-s, i) }
          .take(e).map(_._1)
      }
      (beam, visited)
    }
    for (heur <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val adj = Array.tabulate(maxLevel + 1)(l => buildLevel(l, heur))
      val bt = (System.nanoTime() - t0) / 1e9
      val edges = adj.map(_.values.map(_.length).sum).sum
      for ((ef, efU, r0, ru) <- Seq((24, 4, 3, 1), (48, 8, 3, 2))) {
        val hits = (0 until NQ).map(i => walk(adj, qv(i), ef, efU, r0, ru).toSet)
        val rec = (0 until NQ).map(i => (hits(i) & brute(i)).size / 10.0).sum / NQ
        val tgt = (0 until NQ).count(i => hits(i).contains((8000 * i) % N)) / 8.0
        println(f"heur=$heur edges=$edges build=$bt%.1f ef=$ef efU=$efU r0=$r0 ru=$ru -> recall=$rec%.3f target=$tgt%.3f")
      }
      // wide-upper schedules: (narrowLevel, wideWidth, narrowWidth, ef0, r0)
      for ((nl, w, nw, ef0, r0) <- Seq((4, 512, 64, 48, 3), (5, 1024, 96, 64, 3),
          (4, 2048, 128, 96, 4))) {
        def width(l: Int): Int =
          if (l == 0) ef0 else if (l >= nl) w else nw
        val rs = (0 until NQ).map(i => walkW(adj, qv(i), width, r0))
        val hits = rs.map(_._1.toSet)
        val vis = rs.map(_._2).sum / NQ
        val rec = (0 until NQ).map(i => (hits(i) & brute(i)).size / 10.0).sum / NQ
        val tgt = (0 until NQ).count(i => hits(i).contains((8000 * i) % N)) / 8.0
        println(f"heur=$heur WIDE nl=$nl w=$w nw=$nw ef0=$ef0 r0=$r0 -> recall=$rec%.3f target=$tgt%.3f visited=$vis")
      }
    }
  }
}
