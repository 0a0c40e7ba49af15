package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization => PQ}

/** Persisted serving state — the on-disk form of [[Serving.IndexState]]
  * with MANIFEST-COMMITTED SNAPSHOTS (round-14 verdict task 2): every
  * refresh writes a complete new asset version and publishes it with
  * one atomic manifest create, so a reader can NEVER pair new
  * codebooks with a stale `residual_codes` flag (the wrong-ranking
  * trap the router guard exists to prevent) — it serves entirely the
  * snapshot it pinned at [[load]] time, or entirely the next one.
  * Layout:
  *
  * {{{
  *   dir/byid/          REQUIRED — the raw corpus as a ByidStore
  *                      (point-fetch layout, CDC-maintained per x20);
  *                      doubles as the `vectors` relation AND the
  *                      rescore point-read source. Shared across
  *                      snapshots; each manifest PINS the batch range
  *                      [byid_base, byid_pin] it serves, so CDC
  *                      batches applied after a snapshot are invisible
  *                      to its readers.
  *   dir/v_NNNNN/       snapshot N's assets, each optional:
  *     cells/           Search.ivfAssign output
  *     encoded/         PQ.pqEncode output (+ cell column)
  *     words/           Serving.signPackAll output
  *     centroids/       (tenant, cell, centroid) rows
  *     codebooks/       (tenant, s, c, codeword) rows
  *   dir/manifest_NNNNN committed manifest: catalog counters, asset
  *                      list, byid pin, recall curve. Published via
  *                      atomic create-no-overwrite (hard-link of a
  *                      staged tmp — the VersionedStore publish
  *                      primitive), so snapshot N exists either fully
  *                      or not at all.
  * }}}
  *
  * REFRESH = [[saveSnapshot]]: write v_(N+1) assets, checkpoint the
  * byid store (fold to one fresh base — the natural compaction point,
  * so a newly-committed snapshot always serves full-scan tiers off
  * the single-segment fast path), commit manifest_(N+1). Old
  * snapshots keep serving their pinned assets + byid range until
  * [[vacuum]] retires everything below the newest manifest.
  *
  * Driver-side maps (centroids, codebooks) round-trip through parquet
  * `array<double>` columns — bit-exact, so a saved+loaded state serves
  * hash-identical results (ServingStateSpec pins this). Cell and
  * codeword ids are dense (the engine's renumbering), so ordering by
  * id reconstructs the arrays losslessly.
  */
object ServingState {

  private def exists(p: String): Boolean = new File(p).exists()

  private def vDir(dir: String, n: Int): String = f"$dir/v_$n%05d"
  private def manifestPath(dir: String, n: Int): String = f"$dir/manifest_$n%05d"

  private def numbered(dir: String, prefix: String): Seq[Int] = {
    val fs = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
    fs.filter(_.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix).toInt).sorted.toSeq
  }

  /** Committed snapshot numbers, ascending. */
  def snapshots(dir: String): Seq[Int] = numbered(dir, "manifest_")

  /** Write snapshot N+1 and publish it atomically. DataFrame assets
    * are written under the snapshot's own `v_` dir; driver-side maps
    * as parquet rows beside them; `recallCurve` (measured via
    * `Serving.measureRecallCurve`) and the catalog counters go in the
    * manifest. The byid store (REQUIRED, CDC-maintained in place by
    * the feed) is CHECKPOINTED when it has pending deltas or
    * tombstones — the manifest pins the resulting single full base,
    * so this snapshot's full scans take the merge-free fast path and
    * its reads never see later CDC batches. Returns the snapshot
    * number. Crash-safe: a crash before the manifest create leaves
    * only invisible `v_` / byid-checkpoint debris (numbered past, so
    * never resurrected; reclaimed by [[vacuum]]). */
  def saveSnapshot(spark: SparkSession, dir: String,
                   centroids: Option[Map[String, Array[Array[Double]]]] = None,
                   codebooks: Option[Map[String, PQ.Codebooks]] = None,
                   cells: Option[DataFrame] = None,
                   encoded: Option[DataFrame] = None,
                   words: Option[DataFrame] = None,
                   postings: Option[DataFrame] = None,
                   lexStats: Map[String, (Long, Double)] = Map.empty,
                   lexCounters: Map[String, (Long, Long)] = Map.empty,
                   corpusSize: Long = -1L,
                   encodedHasCells: Boolean = false,
                   residualCodes: Boolean = false,
                   recallCurve: Seq[Serving.RecallPoint] = Nil,
                   recallMeasuredAt: Long = -1L,
                   idCol: String = "id"): Int = {
    import spark.implicits._
    val byid = s"$dir/byid"
    require(ByidStore.segments(byid).nonEmpty,
      s"serving state at $dir has no byid store — init it before snapshotting")
    val n = (snapshots(dir) ++ numbered(dir, "v_")).foldLeft(0)(math.max) + 1
    val v = vDir(dir, n)
    Files.createDirectories(Paths.get(v))
    centroids.foreach { m =>
      m.toSeq.flatMap { case (t, cents) =>
        cents.zipWithIndex.map { case (c, i) => (t, i, c.toSeq) }
      }.toDF("tenant", "cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$v/centroids")
    }
    codebooks.foreach { m =>
      m.toSeq.flatMap { case (t, books) =>
        books.toSeq.zipWithIndex.flatMap { case (cb, s) =>
          cb.toSeq.zipWithIndex.map { case (cw, c) => (t, s, c, cw.toSeq) }
        }
      }.toDF("tenant", "s", "c", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$v/codebooks")
    }
    cells.foreach(_.write.mode("overwrite").parquet(s"$v/cells"))
    encoded.foreach(_.write.mode("overwrite").parquet(s"$v/encoded"))
    words.foreach(_.write.mode("overwrite").parquet(s"$v/words"))
    // term-sorted layout: the hybrid tier fetches a batch's distinct
    // terms via a balanced or-of-eq (Layout.stringsPredicate), which
    // page-prunes ONLY over a term-clustered file — unsorted postings
    // would make every serve read the whole asset
    postings.foreach(_.repartitionByRange(col("tenant"), col("term"))
      .sortWithinPartitions("tenant", "term")
      .write.mode("overwrite").parquet(s"$v/postings"))
    // fold pending deltas so this snapshot pins one fresh full base
    // (merge-free fast path); older manifests keep their own pins
    val base =
      if (ByidStore.segments(byid).size > 1 || ByidStore.tombstones(byid).nonEmpty)
        ByidStore.checkpoint(spark, byid, idCol)
      else ByidStore.segments(byid).head
    val size =
      if (corpusSize >= 0) corpusSize
      else ByidStore.readAll(spark, byid, idCol, Some((base, base))).count()
    // maintained integer counters (applyLexCdc's output) take
    // precedence: they persist losslessly and re-derive avgdl with
    // the same one division lexStatsOf performs, so a refresh loop
    // can thread them manifest-to-manifest without any O(corpus)
    // lexStatsOf rebuild (r15 verdict task 2)
    val stats =
      if (lexCounters.nonEmpty && lexStats.isEmpty)
        Serving.lexStatsFromCounters(lexCounters)
      else lexStats
    val lines = Seq(
      s"corpus_size=$size",
      s"encoded_has_cells=$encodedHasCells",
      s"residual_codes=$residualCodes",
      s"byid_base=$base",
      s"byid_pin=$base") ++
      // provenance for the routing staleness guard: the corpus size
      // the curve was MEASURED against — this snapshot's own size
      // unless the caller threads an inherited curve's origin through
      (if (recallCurve.nonEmpty)
        Seq(s"recall_at=${if (recallMeasuredAt > 0) recallMeasuredAt else size}")
      else Nil) ++
      recallCurve.map(p => s"recall=${p.tier},${p.nProbe},${p.rescoreK},${p.recall}") ++
      // doubles as exact decimal strings — Java round-trips them
      stats.toSeq.sortBy(_._1).map { case (t, (n, avgdl)) =>
        s"lexstats=$t,$n,$avgdl" } ++
      lexCounters.toSeq.sortBy(_._1).map { case (t, (n, sdl)) =>
        s"lexcounters=$t,$n,$sdl" }
    publishManifest(dir, n, lines)
    n
  }

  /** The maintained per-tenant (nDocs, Σdl) counters a snapshot
    * recorded — the integers a lexical CDC loop threads into its next
    * `Serving.applyLexCdc` epoch after loading a snapshot. Empty for
    * snapshots saved without counters. */
  def lexCounters(dir: String, n: Int): Map[String, (Long, Long)] =
    read(dir, n).linesIterator.collect {
      case l if l.startsWith("lexcounters=") =>
        val Array(t, nd, sdl) = l.stripPrefix("lexcounters=").split(",")
        t -> (nd.toLong, sdl.toLong)
    }.toMap

  /** Atomic create-no-overwrite publish (the VersionedStore
    * primitive): write staged, hard-link into the final name — the
    * link fails atomically in the kernel if a racing writer already
    * published this snapshot number, so a double-refresh is a loud
    * ConcurrentModificationException, never a silent overwrite.
    *
    * The staging path is PER-WRITER-UNIQUE (pid + a random token —
    * racing writers can share a pid when they are threads of one
    * refresher process): with a shared deterministic tmp name, a
    * losing writer could overwrite the staged bytes between the
    * winner's write and its link — the winner would publish the
    * loser's manifest — and the winner's cleanup could delete a
    * racer's freshly staged file (ADVICE r15). Only the createLink
    * below touches shared state; each writer stages, links, and
    * deletes exclusively its own tmp. */
  private[graft] def publishManifest(dir: String, n: Int,
                                     lines: Seq[String]): Unit = {
    val token = ProcessHandle.current().pid() + "_" +
      java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val tmp = Paths.get(dir, f"_manifest_$n%05d.$token%s.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    try Files.createLink(Paths.get(manifestPath(dir, n)), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"serving state: snapshot $n already committed by another writer")
    }
    Files.deleteIfExists(tmp): Unit
  }

  /** Retire everything below the NEWEST committed snapshot: older
    * manifests, their `v_` asset dirs, byid batches below the newest
    * pin's base, and any uncommitted debris. Callers guarantee no
    * live reader still pins a retired snapshot (the VersionedStore
    * vacuum contract — a grace period on a real deployment). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"serving state at $dir has no committed snapshot")
    val keep = snaps.last
    val base = stat(read(dir, keep), "byid_base").toInt
    ByidStore.retireBelow(s"$dir/byid", base)
    snaps.filter(_ < keep).foreach { n =>
      Files.deleteIfExists(Paths.get(manifestPath(dir, n))): Unit
    }
    numbered(dir, "v_").filter(_ != keep)
      .foreach(n => deleteRecursively(new File(vDir(dir, n))))
    // staged-manifest debris carries per-writer-unique suffixes —
    // match by shape, not by parsing a number out of the name
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("_manifest_") &&
        f.getName.endsWith(".tmp"))
      .foreach(f => Files.deleteIfExists(f.toPath): Unit)
  }

  private def read(dir: String, n: Int): String =
    Files.readString(Paths.get(manifestPath(dir, n)))

  private def stat(manifest: String, k: String): String =
    manifest.linesIterator.collectFirst {
      case l if l.startsWith(k + "=") => l.stripPrefix(k + "=")
    }.getOrElse(throw new IllegalStateException(s"manifest missing $k"))

  private[graft] def loadCentroids(spark: SparkSession,
                                       path: String): Map[String, Array[Array[Double]]] =
    spark.read.parquet(path)
      .select(col("tenant"), col("cell"), col("centroid"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1)
      .map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3) }

  private[graft] def loadCodebooks(spark: SparkSession,
                                       path: String): Map[String, PQ.Codebooks] =
    spark.read.parquet(path)
      .select(col("tenant"), col("s"), col("c"), col("codeword"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getSeq[Double](3).toArray))
      .groupBy(_._1)
      .map { case (t, rs) =>
        t -> rs.groupBy(_._2).toSeq.sortBy(_._1)
          .map(_._2.sortBy(_._3).map(_._4).toArray).toArray
      }

  /** Open the NEWEST committed snapshot — the refresh-racing read:
    * whichever manifest the atomic create has published by now is the
    * one served, fully (old or new, never a torn pairing). */
  def load(spark: SparkSession, dir: String,
           tenantCol: String = "tenant", idCol: String = "id",
           embCol: String = "embedding"): Serving.IndexState = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"serving state at $dir has no committed snapshot")
    loadSnapshot(spark, dir, snaps.last, tenantCol, idCol, embCol)
  }

  /** Open one PINNED snapshot: every asset read comes from its `v_`
    * dir, every byid read from its pinned batch range — the state is
    * immutable under concurrent refreshes (until vacuum). */
  def loadSnapshot(spark: SparkSession, dir: String, n: Int,
                   tenantCol: String = "tenant", idCol: String = "id",
                   embCol: String = "embedding"): Serving.IndexState = {
    val byid = s"$dir/byid"
    val m = read(dir, n)
    val v = vDir(dir, n)
    val base = stat(m, "byid_base").toInt
    val pin = stat(m, "byid_pin").toInt
    val curve = m.linesIterator.collect {
      case l if l.startsWith("recall=") =>
        val Array(t, np, rk, r) = l.stripPrefix("recall=").split(",")
        Serving.RecallPoint(t, np.toInt, rk.toInt, r.toDouble)
    }.toSeq
    val lex = m.linesIterator.collect {
      case l if l.startsWith("lexstats=") =>
        val Array(t, nd, adl) = l.stripPrefix("lexstats=").split(",")
        t -> (nd.toLong, adl.toDouble)
    }.toMap
    Serving.IndexState(
      vectors = ByidStore.readAll(spark, byid, idCol, Some((base, pin))),
      corpusSize = stat(m, "corpus_size").toLong,
      centroids = if (exists(s"$v/centroids"))
        Some(loadCentroids(spark, s"$v/centroids")) else None,
      cells = if (exists(s"$v/cells"))
        Some(spark.read.parquet(s"$v/cells")) else None,
      codebooks = if (exists(s"$v/codebooks"))
        Some(loadCodebooks(spark, s"$v/codebooks")) else None,
      encoded = if (exists(s"$v/encoded"))
        Some(spark.read.parquet(s"$v/encoded")) else None,
      encodedHasCells = stat(m, "encoded_has_cells").toBoolean,
      residualCodes = stat(m, "residual_codes").toBoolean,
      signWords = if (exists(s"$v/words"))
        Some(spark.read.parquet(s"$v/words")) else None,
      byidPath = Some(byid),
      byidRange = Some((base, pin)),
      recallCurve = curve,
      recallMeasuredAt =
        if (curve.isEmpty) -1L
        else m.linesIterator.collectFirst {
          case l if l.startsWith("recall_at=") =>
            l.stripPrefix("recall_at=").toLong
        }.getOrElse(stat(m, "corpus_size").toLong),
      postings = if (exists(s"$v/postings"))
        Some(spark.read.parquet(s"$v/postings")) else None,
      lexStats = lex,
      tenantCol = tenantCol, idCol = idCol, embCol = embCol)
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
