package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Snapshot-versioned bucketed vector store — the manifest layer the
  * write-audit-publish upsert's Scaladoc names as the one contract
  * plain parquet renames cannot give: CROSS-BUCKET ATOMICITY (every
  * touched bucket flips in one commit) plus TIME TRAVEL (any previous
  * snapshot stays readable until vacuumed). The design is the
  * Iceberg/Delta core reduced to its essentials, with no table-format
  * dependency:
  *
  * Layout:
  * {{{
  *   path/data/owner=o/bucket=b/v=N/part-*.parquet   immutable version dirs
  *   path/manifest/snap-N.txt                        snapshot manifests
  * }}}
  *
  * A manifest lists every live (owner, bucket) → data version. Commit
  * = write `snap-N.txt.tmp`, then ONE atomic rename to `snap-N.txt`
  * (snapshot ids are monotonic, so the destination never exists).
  * Readers never run partition discovery over `data/` — they read the
  * manifest and scan exactly its version dirs, so uncommitted writer
  * output (a crash before commit) is invisible garbage, not
  * corruption, and concurrent readers of snapshot K are never
  * affected by a writer building K+1. Untouched buckets carry their
  * pointer forward — snapshots SHARE unchanged files (storage grows
  * with churn, not table size × snapshots). Single-writer (like Delta
  * without a locking service); `vacuum` drops data dirs no retained
  * manifest references.
  *
  * At 100 TB: the manifest is bucket-count-bounded (one line per
  * bucket — the same granularity Iceberg tracks per data file, far
  * coarser here), commits are O(touched buckets) appends + one
  * rename, and a snapshot read plans partition-pruned scans from the
  * manifest's explicit path list.
  */
object VersionedStore {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = s"${path.stripSuffix("/")}/manifest"
  private def dataDir(path: String) = s"${path.stripSuffix("/")}/data"
  private def deletesDir(path: String) = s"${path.stripSuffix("/")}/deletes"
  private def dvDir(path: String, n: Int) = s"${deletesDir(path)}/dv=$n"
  private def manifestFile(path: String, n: Int) = s"${manifestDir(path)}/snap-$n.txt"

  /** One manifest line: live data version of an (owner, bucket), plus
    * an optional DELETE-VECTOR reference (merge-on-read soft deletes —
    * the Iceberg-v2 positional-delete idea at doc granularity): `dv=k`
    * means the ids under `deletes/dv=k/owner=o/bucket=b` are subtracted
    * at read time. A bucket REWRITE (upsert/compact) folds the dv into
    * the new data version and clears the reference.
    *
    * `stats` is the bucket's ZONE MAP — (min, max) of the table's
    * cluster column (see [[RangeLayout]]) over the bucket's CURRENT
    * content. Maintained on every rewrite (recomputed from the staged
    * data inside the same audit read that counts rows); deletes only
    * shrink content, so stale stats stay a valid over-approximation
    * and soft deletes never have to touch them. */
  /** `wid`/`dvw` are WRITER IDS (round-12 verdict task 6 — optimistic
    * concurrency for overlapping-bucket writers): every staging write
    * lands under a writer-unique `w=<wid>` subdir of its `v=<n>` (or
    * `dv=<n>`) dir, and the manifest entry records which writer's
    * subdir is live. Two writers racing the same bucket therefore
    * NEVER share a directory — each stages its own files, exactly one
    * wins the atomic manifest publish, and the loser gets
    * ConcurrentModificationException with its orphan w-dir invisible
    * to every reader (vacuum reclaims it). This is the Iceberg/Delta
    * principle (writers never mutate shared paths; the commit is the
    * only conflict point) at bucket-dir granularity. The fields are
    * optional for manifest back-compat: wid-less entries read the
    * bare v/dv dir. */
  private[graft] final case class ManifestEntry(owner: String, bucket: Long,
                                                v: Int, dv: Option[Int],
                                                stats: Option[(Double, Double)] = None,
                                                bloom: Option[String] = None,
                                                stats2: Option[(Double, Double)] = None,
                                                wid: Option[String] = None,
                                                dvw: Option[String] = None)

  /** Fresh writer id — unique per staging attempt, so a crashed
    * attempt's retry writes a NEW subdir and never collides with its
    * own debris (or with a live concurrent writer's). */
  private[graft] def newWid(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Per-bucket BLOOM FILTER config — the Iceberg bloom-metadata idea
    * at bucket granularity, the equality-lookup counterpart of the
    * zone map: `#bloom\tcol\tmBits\tk` in the manifest header, and
    * each entry carries `bloom:<hex>` — an mBits-bit filter over the
    * column's values in the bucket's CURRENT content. Bit i of value
    * v = int(first 6 hex digits of md5(v + ":" + i)) mod mBits — pure
    * md5 arithmetic, reproducible by any engine (the DuckDB oracle
    * replays it bit-exactly, false positives included). Maintained on
    * every rewrite from the staged content; deletes only shrink
    * content, so stale filters stay a sound over-approximation. */
  private[graft] final case class BloomConfig(col: String, mBits: Int, k: Int)

  /** How rows map to buckets — recorded as a `#layout` header line in
    * every manifest so writers after a layout change keep assigning
    * consistently (the Iceberg partition-spec-evolution idea: the
    * manifest IS the layout).
    *
    *  - [[HashLayout]]: bucket = doc_id mod nBuckets (the upsert-
    *    friendly default — a doc's bucket is derivable from its key).
    *  - [[RangeLayout]]: bucket = fixed-width bin of `col` over
    *    [mn, mx] frozen at `compactClustered` time, out-of-range
    *    values clamped into the edge bins. Range layout + per-bucket
    *    zone maps is what makes `readSnapshotRange` skip buckets —
    *    the Delta OPTIMIZE-ZORDER + data-skipping move, reduced to
    *    one clustering dimension. Fixed-width (not quantile) bins are
    *    chosen deliberately: assignment is pure arithmetic on frozen
    *    constants, so it is reproducible by any engine (the DuckDB
    *    oracle replays it exactly) and needs no boundary table; a
    *    production port can swap in quantile boundaries computed once
    *    at compact time without changing any other contract. */
  private[graft] sealed trait Layout { def nBuckets: Int }
  private[graft] final case class HashLayout(nBuckets: Int) extends Layout
  private[graft] final case class RangeLayout(col: String, mn: Double, mx: Double,
                                              nBuckets: Int) extends Layout

  /** Z-ORDER layout — two-dimensional clustering on the interleaved-
    * bit curve (Delta's OPTIMIZE ZORDER proper): each dim is
    * fixed-width-binned onto [0, 2^bits) over its frozen [mn, mx]
    * (edge clamp like RangeLayout), the bins are bit-interleaved into
    * a curve value z ∈ [0, 4^bits), and bucket = z div (4^bits /
    * nBuckets) — one contiguous curve band per bucket. Entries carry
    * TWO zone maps (`stats` = colX, `stats2` = colY), so a 2-D box
    * predicate prunes every bucket whose rectangle misses the box —
    * the property single-column clustering cannot give. nBuckets must
    * divide 4^bits. */
  private[graft] final case class ZLayout(colX: String, colY: String,
                                          mnX: Double, mxX: Double,
                                          mnY: Double, mxY: Double,
                                          bits: Int, nBuckets: Int) extends Layout

  /** Committed snapshot ids, ascending (only fully-committed manifests
    * appear — the tmp file is never listed as a snapshot). */
  def snapshots(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val dir = new Path(manifestDir(path))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".txt") =>
        s.stripPrefix("snap-").stripSuffix(".txt").toInt }
      .sorted.toSeq
  }

  def currentSnapshot(spark: SparkSession, path: String): Option[Int] =
    snapshots(spark, path).lastOption

  /** NAMED REFS (Iceberg tags): a tag is one file
    * `manifest/tag-<name>.txt` holding a committed snapshot id,
    * published through the same write-tmp-then-rename move as a
    * manifest (rename overwrite = atomic retag; readers of the old
    * target are unaffected — the snapshot itself is immutable). Tags
    * give callers stable names for audit/rollback points ("the corpus
    * the model trained on") without pinning to raw snapshot numbers;
    * vacuum-retained snapshots stay readable by tag forever. */
  def tagSnapshot(spark: SparkSession, path: String, tag: String,
                  snapshot: Int): Unit = {
    require(tag.matches("[A-Za-z0-9._-]+"), s"invalid tag name '$tag'")
    require(snapshots(spark, path).contains(snapshot),
      s"tagSnapshot: snapshot $snapshot not committed at $path")
    val fs = fsOf(spark, path)
    val tmp = new Path(s"${manifestDir(path)}/tag-$tag.txt.tmp")
    val dst = new Path(s"${manifestDir(path)}/tag-$tag.txt")
    val out = fs.create(tmp, true)
    out.write(snapshot.toString.getBytes("UTF-8")); out.close()
    if (fs.exists(dst)) fs.delete(dst, false) // retag: replace atomically-enough
    require(fs.rename(tmp, dst), s"tagSnapshot: rename failed for $tag")
  }

  /** Resolve a tag to its snapshot id. Reads with a fill loop (a
    * single InputStream.read may legally return short) and fails with
    * a descriptive message on an empty or non-numeric tag file rather
    * than an opaque index error. */
  def resolveTag(spark: SparkSession, path: String, tag: String): Int = {
    val fs = fsOf(spark, path)
    val f = new Path(s"${manifestDir(path)}/tag-$tag.txt")
    require(fs.exists(f), s"resolveTag: no tag '$tag' at $path")
    val in = fs.open(f)
    val bytes = new Array[Byte](32)
    var n = 0
    try {
      var r = in.read(bytes, n, bytes.length - n)
      while (r > 0) { n += r; r = in.read(bytes, n, bytes.length - n) }
    } finally in.close()
    require(n > 0, s"resolveTag: tag file for '$tag' at $path is empty")
    val s = new String(bytes, 0, n, "UTF-8").trim
    require(s.nonEmpty && s.forall(_.isDigit),
      s"resolveTag: tag '$tag' at $path holds non-numeric content '$s'")
    s.toInt
  }

  /** All tags at `path` with their resolved snapshot ids. */
  def listTags(spark: SparkSession, path: String): Map[String, Int] = {
    val fs = fsOf(spark, path)
    val dir = new Path(manifestDir(path))
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("tag-") && s.endsWith(".txt") =>
        val name = s.stripPrefix("tag-").stripSuffix(".txt")
        name -> resolveTag(spark, path, name)
      }.toMap
  }

  /** Drop a tag (releases its vacuum pin). */
  def dropTag(spark: SparkSession, path: String, tag: String): Unit = {
    val fs = fsOf(spark, path)
    val f = new Path(s"${manifestDir(path)}/tag-$tag.txt")
    require(fs.exists(f), s"dropTag: no tag '$tag' at $path")
    fs.delete(f, false)
  }

  /** Read the snapshot a tag names. */
  def readSnapshotByTag(spark: SparkSession, path: String,
                        tag: String): DataFrame =
    readSnapshot(spark, path, resolveTag(spark, path, tag))

  /** Full entries of snapshot `n`, including delete-vector refs and
    * zone-map stats. Lines are `owner\tbucket\tv` followed by optional
    * prefixed fields in any order: `dv:k`, `stats:min,max`. A first
    * line starting with `#layout` is the layout header (see
    * [[readLayout]]); `#`-lines are skipped here. */
  private[graft] def readManifestFull(spark: SparkSession, path: String,
                                      n: Int): Seq[ManifestEntry] = {
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(manifestFile(path, n)))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
          val f = line.split('\t')
          if (f.length < 3) throw new IllegalStateException(
            s"manifest $n: unparseable line '$line'")
          val opts = f.drop(3)
          val dv = opts.collectFirst { case s if s.startsWith("dv:") =>
            s.stripPrefix("dv:").toInt }
          val stats = opts.collectFirst { case s if s.startsWith("stats:") =>
            val Array(lo, hi) = s.stripPrefix("stats:").split(',')
            (lo.toDouble, hi.toDouble) }
          val bloom = opts.collectFirst { case s if s.startsWith("bloom:") =>
            s.stripPrefix("bloom:") }
          val stats2 = opts.collectFirst { case s if s.startsWith("stats2:") =>
            val Array(lo, hi) = s.stripPrefix("stats2:").split(',')
            (lo.toDouble, hi.toDouble) }
          val wid = opts.collectFirst { case s if s.startsWith("wid:") =>
            s.stripPrefix("wid:") }
          val dvw = opts.collectFirst { case s if s.startsWith("dvw:") =>
            s.stripPrefix("dvw:") }
          val unknown = opts.filterNot(s => s.startsWith("dv:") ||
            s.startsWith("stats:") || s.startsWith("stats2:") ||
            s.startsWith("bloom:") || s.startsWith("wid:") ||
            s.startsWith("dvw:"))
          if (unknown.nonEmpty) throw new IllegalStateException(
            s"manifest $n: unknown field '${unknown.head}'")
          ManifestEntry(f(0), f(1).toLong, f(2).toInt, dv, stats, bloom,
            stats2, wid, dvw)
        }.toList
    } finally in.close()
  }

  /** Layout header of snapshot `n`, if the manifest carries one.
    * Manifests written before layout tracking have no header — callers
    * fall back to hash bucketing with their own nBuckets. */
  private[graft] def readLayout(spark: SparkSession, path: String,
                                n: Int): Option[Layout] = {
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(manifestFile(path, n)))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .find(_.startsWith("#layout")).map { line =>
          line.split('\t') match {
            case Array("#layout", "hash", nb) => HashLayout(nb.toInt)
            case Array("#layout", "range", c, mn, mx, nb) =>
              RangeLayout(c, mn.toDouble, mx.toDouble, nb.toInt)
            case Array("#layout", "zorder", cx, cy, mnx, mxx, mny, mxy, bits, nb) =>
              ZLayout(cx, cy, mnx.toDouble, mxx.toDouble, mny.toDouble,
                mxy.toDouble, bits.toInt, nb.toInt)
            case bad => throw new IllegalStateException(
              s"manifest $n: unparseable layout '${bad.mkString("\t")}'")
          }
        }
    } finally in.close()
  }

  /** (owner, bucket, data version) entries of snapshot `n` — the
    * dv-blind projection every layout consumer uses. */
  private[graft] def readManifest(spark: SparkSession, path: String,
                                  n: Int): Seq[(String, Long, Int)] =
    readManifestFull(spark, path, n).map(e => (e.owner, e.bucket, e.v))

  /** Write manifest `n` then commit with one atomic rename — the
    * cross-bucket commit point. */
  /** Bloom config header of snapshot `n`, if present. */
  private[graft] def readBloomConfig(spark: SparkSession, path: String,
                                     n: Int): Option[BloomConfig] = {
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(manifestFile(path, n)))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .find(_.startsWith("#bloom")).map { line =>
          line.split('\t') match {
            case Array("#bloom", c, m, k) => BloomConfig(c, m.toInt, k.toInt)
            case bad => throw new IllegalStateException(
              s"manifest $n: unparseable bloom header '${bad.mkString("\t")}'")
          }
        }
    } finally in.close()
  }

  private[graft] def commitManifestFull(spark: SparkSession, path: String, n: Int,
                                        entries: Seq[ManifestEntry],
                                        layout: Option[Layout] = None,
                                        bloom: Option[BloomConfig] = None): Unit = {
    val fs = fsOf(spark, path)
    // tmp must be UNIQUE PER WRITER: two racers staging the same
    // snapshot id would otherwise interleave writes into one shared
    // tmp file and publish a mix (found by the racing-writers spec)
    val tmp = new Path(manifestFile(path, n) +
      s".${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val fin = new Path(manifestFile(path, n))
    if (!fs.exists(tmp.getParent)) fs.mkdirs(tmp.getParent)
    val header = layout.map {
      case HashLayout(nb) => s"#layout\thash\t$nb\n"
      case RangeLayout(c, mn, mx, nb) => s"#layout\trange\t$c\t$mn\t$mx\t$nb\n"
      case ZLayout(cx, cy, mnx, mxx, mny, mxy, bits, nb) =>
        s"#layout\tzorder\t$cx\t$cy\t$mnx\t$mxx\t$mny\t$mxy\t$bits\t$nb\n"
    }.getOrElse("") +
      bloom.map(b => s"#bloom\t${b.col}\t${b.mBits}\t${b.k}\n").getOrElse("")
    val out = fs.create(tmp, true)
    try out.write((header + entries.sortBy(e => (e.owner, e.bucket))
      .map(e => s"${e.owner}\t${e.bucket}\t${e.v}" +
        e.dv.map(k => s"\tdv:$k").getOrElse("") +
        e.stats.map { case (lo, hi) => s"\tstats:$lo,$hi" }.getOrElse("") +
        e.stats2.map { case (lo, hi) => s"\tstats2:$lo,$hi" }.getOrElse("") +
        e.bloom.map(h => s"\tbloom:$h").getOrElse("") +
        e.wid.map(w => s"\twid:$w").getOrElse("") +
        e.dvw.map(w => s"\tdvw:$w").getOrElse(""))
      .mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close()
    // optimistic concurrency: EXACTLY ONE writer may publish snapshot
    // n; every loser must get ConcurrentModificationException and
    // restage (its orphan v-dirs are invisible garbage). The publish
    // primitive must be atomic create-no-overwrite — an exists+rename
    // pair has a TOCTOU window, and POSIX renameTo OVERWRITES an
    // existing destination, silently discarding the racing winner's
    // manifest (the racing-writers spec caught exactly this). Local
    // fs: hard-link(2) the tmp into place — link fails with EEXIST
    // atomically in the kernel. HDFS: rename is atomic and fails when
    // the destination exists. S3: PUT with If-None-Match.
    if (fs.getScheme == "file") {
      val tmpP = java.nio.file.Paths.get(tmp.toUri.getPath)
      val finP = java.nio.file.Paths.get(fin.toUri.getPath)
      // ChecksumFileSystem wrote a `.{name}.crc` sidecar next to tmp;
      // NIO link/delete bypasses it, so carry the sidecar to the
      // published name (manifest reads stay checksum-verified) and
      // drop the tmp THROUGH the Hadoop API so its sidecar goes with
      // it — the bare-NIO form orphaned one .crc per commit.
      def crcOf(p: Path) = java.nio.file.Paths.get(
        new Path(p.getParent, "." + p.getName + ".crc").toUri.getPath)
      try {
        java.nio.file.Files.createLink(finP, tmpP)
        // only the single winner for snapshot n reaches this line, so
        // the sidecar link has no concurrent writer; a stale fin crc
        // can only be debris from a manually-deleted manifest
        if (java.nio.file.Files.exists(crcOf(tmp))) {
          java.nio.file.Files.deleteIfExists(crcOf(fin))
          java.nio.file.Files.createLink(crcOf(fin), crcOf(tmp))
        }
        fs.delete(tmp, false)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          throw new java.util.ConcurrentModificationException(
            s"versioned commit: snapshot $n already committed by another writer")
      }
    } else {
      if (fs.exists(fin))
        throw new java.util.ConcurrentModificationException(
          s"versioned commit: snapshot $n already committed by another writer")
      if (!fs.rename(tmp, fin))
        throw new java.util.ConcurrentModificationException(
          s"versioned commit: snapshot $n lost the atomic rename to another writer")
    }
  }


  private def bucketDir(path: String, o: String, b: Long, v: Int) =
    s"${dataDir(path)}/owner=$o/bucket=$b/v=$v"

  /** The data dir an entry's rows actually live in: the writer-unique
    * `w=` subdir when the entry carries a wid, the bare v dir for
    * legacy entries. */
  private def entryDir(path: String, e: ManifestEntry) =
    bucketDir(path, e.owner, e.bucket, e.v) +
      e.wid.map(w => s"/w=$w").getOrElse("")

  /** The delete-vector dir an entry references (requires e.dv). */
  private def dvRefDir(path: String, e: ManifestEntry) =
    dvDir(path, e.dv.get) + e.dvw.map(w => s"/w=$w").getOrElse("") +
      s"/owner=${e.owner}/bucket=${e.bucket}"

  /** Undo Spark's partition-dir escaping (`escapePathName` encodes
    * reserved chars as %hh) when parsing partition VALUES back out of
    * staged dir names. Fixture owners are plain strings, but a weird
    * owner must round-trip — and if this ever disagreed with Spark's
    * escaping, the audit's set compare (read-back partition values vs
    * the manifest's) fails loudly before a commit. */
  private def unescapePath(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Write `staged` (already carrying its `v` column) under this
    * writer's unique `w=<wid>` subdirs — concurrent writers touching
    * the same bucket write DISJOINT directories, so staged data never
    * mixes; the atomic manifest publish is the only conflict point.
    * Returns the (owner, bucket) pairs that actually received data
    * files — the LIVE bucket set, read from the write's own dir
    * layout (partitionBy writes no dir for an empty group), so
    * callers need no separate per-bucket count job to learn which
    * touched buckets survived (optimization r16, guide §1.2).
    *
    * The Spark job writes into a writer-PRIVATE staging root first and
    * is then moved into place with per-bucket-dir renames (metadata-
    * only on local fs/HDFS; an object-store port would swap in a
    * direct-write committer). Writing straight into `dataDir` is not
    * concurrency-safe even with disjoint partition dirs, because every
    * job on one output root shares its `_temporary/0` committer dir —
    * measured: the first racer's job-commit deleted the second's
    * in-flight task files (FileNotFoundException under _temporary). */
  private def writeStaged(staged: DataFrame, path: String,
                          wid: String): Seq[(String, Long)] = {
    val spark = staged.sparkSession
    val stagingRoot = s"${dataDir(path)}/.staging-$wid"
    staged.withColumn("w", lit(wid))
      .write.mode("overwrite").partitionBy("owner", "bucket", "v", "w")
      .parquet(stagingRoot)
    val fs = fsOf(spark, path)
    val root = new Path(stagingRoot)
    val moved = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    for (oDir <- fs.listStatus(root) if oDir.isDirectory;
         bDir <- fs.listStatus(oDir.getPath) if bDir.isDirectory;
         vDir <- fs.listStatus(bDir.getPath) if vDir.isDirectory;
         wDir <- fs.listStatus(vDir.getPath) if wDir.isDirectory) {
      val dst = new Path(s"${dataDir(path)}/${oDir.getPath.getName}/" +
        s"${bDir.getPath.getName}/${vDir.getPath.getName}/${wDir.getPath.getName}")
      fs.mkdirs(dst.getParent)
      if (!fs.rename(wDir.getPath, dst))
        throw new IllegalStateException(
          s"writeStaged: move ${wDir.getPath} -> $dst failed")
      moved += ((unescapePath(oDir.getPath.getName.stripPrefix("owner=")),
        bDir.getPath.getName.stripPrefix("bucket=").toLong))
    }
    fs.delete(root, true)
    moved.distinct.toSeq
  }

  /** Bucket-assignment expression for a layout. Range assignment is
    * pure arithmetic on the frozen [mn, mx] (division by nBuckets in
    * IEEE doubles — engine-independent), out-of-range values clamped
    * into the edge bins (their bucket's zone map widens accordingly at
    * the next audit). */
  /** Fixed-width bin of `c` over frozen [mn, mx] into [0, n), edge-
    * clamped — shared by the range and z-order assignments. */
  private def binExpr(c: String, mn: Double, mx: Double,
                      n: Long): org.apache.spark.sql.Column =
    if (mx <= mn) lit(0L)
    else {
      val w = (mx - mn) / n
      val raw = floor((col(c).cast("double") - lit(mn)) / lit(w)).cast("long")
      greatest(lit(0L), least(raw, lit(n - 1L)))
    }

  private[graft] def bucketExpr(layout: Layout): org.apache.spark.sql.Column =
    layout match {
      case HashLayout(nb) => IndexPipeline.docBucket(col("doc_id"), nb)
      case RangeLayout(c, mn, mx, nb) => binExpr(c, mn, mx, nb.toLong)
      case ZLayout(cx, cy, mnx, mxx, mny, mxy, bits, nb) =>
        val z = graft.operators.Layout.zCol(
          binExpr(cx, mnx, mxx, 1L << bits), binExpr(cy, mny, mxy, 1L << bits), bits)
        z.divide(lit((1L << (2 * bits)) / nb)).cast("long")
    }

  /** The cluster columns a layout maintains zone maps for. */
  private def clusterCols(layout: Option[Layout]): Seq[String] = layout match {
    case Some(RangeLayout(c, _, _, _)) => Seq(c)
    case Some(ZLayout(cx, cy, _, _, _, _, _, _)) => Seq(cx, cy)
    case _ => Nil
  }

  /** The layout writers must assign under: the CURRENT manifest's
    * header, or legacy hash(nBuckets) for headerless manifests. */
  private def layoutOf(spark: SparkSession, path: String, cur: Int,
                       nBuckets: Int): Layout =
    readLayout(spark, path, cur).getOrElse(HashLayout(nBuckets))

  /** Bit i of value v: int(first 6 hex digits of md5(v + ":" + i))
    * mod mBits — the engine-independent arithmetic the oracle
    * replays. */
  private def bloomBitExpr(cfg: BloomConfig, i: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(concat(col(cfg.col).cast("string"), lit(":" + i))),
      1, 6), 16, 10).cast("long"), lit(cfg.mBits.toLong))

  /** Per-(owner, bucket) bloom filters over `df`'s content, hex-
    * encoded. Driver state is bounded: buckets × mBits/8 bytes. */
  private def bloomHexOf(df: DataFrame, cfg: BloomConfig): Map[(String, Long), String] = {
    // null values in the indexed column yield null bits (md5(null) is
    // null) — skip them: a lookupEq probe is always a concrete value,
    // so a null can never match and omitting it keeps the filter sound
    val bits = df.filter(col(cfg.col).isNotNull)
      .select(col("owner"), col("bucket").cast("long").as("bucket"),
        explode(array((0 until cfg.k).map(bloomBitExpr(cfg, _)): _*)).as("bit"))
      .distinct().collect()
    bits.groupBy(r => (r.getString(0), r.getLong(1))).map { case (key, rs) =>
      val bytes = new Array[Byte](cfg.mBits / 8)
      rs.foreach { r =>
        val b = r.getLong(2).toInt
        bytes(b >> 3) = (bytes(b >> 3) | (1 << (b & 7))).toByte
      }
      key -> bytes.map("%02x".format(_)).mkString
    }
  }

  private[graft] def probeBits(value: String, cfg: BloomConfig): Seq[Int] =
    (0 until cfg.k).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest((value + ":" + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 6), 16) % cfg.mBits).toInt
    }

  private def bloomHas(hex: String, bit: Int): Boolean =
    ((Integer.parseInt(hex.substring((bit >> 3) * 2, (bit >> 3) * 2 + 2), 16)
      >> (bit & 7)) & 1) == 1

  /** First load: every bucket's data at v=1, then the snapshot-1
    * commit. */
  def initialLoad(spark: SparkSession, path: String, vectors: DataFrame,
                  nBuckets: Int = 16): Unit = {
    require(currentSnapshot(spark, path).isEmpty,
      s"initialLoad: $path already has snapshots")
    val nv = vectors.withColumn("bucket", IndexPipeline.docBucket(col("doc_id"), nBuckets))
      .withColumn("v", lit(1))
    // owner is a partition key AND a manifest key derived back from the
    // dir name: a null/empty owner writes __HIVE_DEFAULT_PARTITION__,
    // which unescapePath returns literally — the manifest owner would
    // stop round-tripping to the data's value, and initialLoad commits
    // without an audit to catch it (ADVICE r16). Fail fast in the same
    // write pass instead (raise_error evaluates per row, costs nothing
    // on valid data).
    nv.withColumn("owner",
        when(col("owner").isNull || col("owner") === "",
          raise_error(lit("initialLoad: owner must be non-null/non-empty " +
            "(it is a partition key the manifest round-trips)")))
          .otherwise(col("owner")))
      .repartition(col("owner"), col("bucket"))
      .write.mode("overwrite").partitionBy("owner", "bucket", "v")
      .parquet(dataDir(path))
    // manifest entries from the write's own partition dirs — the input
    // plan runs once (the write), no second distinct-collect pass
    // (optimization r16, guide §1.2)
    val fs = fsOf(spark, path)
    val entries = (for {
      o <- fs.listStatus(new Path(dataDir(path))).toSeq
      if o.isDirectory && o.getPath.getName.startsWith("owner=")
      b <- fs.listStatus(o.getPath).toSeq
      if b.isDirectory && b.getPath.getName.startsWith("bucket=")
    } yield ManifestEntry(
      unescapePath(o.getPath.getName.stripPrefix("owner=")),
      b.getPath.getName.stripPrefix("bucket=").toLong, 1, None))
    commitManifestFull(spark, path, 1, entries, Some(HashLayout(nBuckets)))
  }

  private[graft] case class StagedVersion(next: Int, expectedRows: Long,
                                          touched: Seq[(String, Long)],
                                          entries: Seq[ManifestEntry],
                                          layout: Option[Layout] = None,
                                          bloom: Option[BloomConfig] = None,
                                          probedBuckets: Int = -1,
                                          wid: Option[String] = None)

  /** Stage the next snapshot's data: merged content of every touched
    * bucket written to NEW v=next dirs (append-only — live version
    * dirs and the current manifest are untouched, so a crash anywhere
    * in here leaves orphan dirs no reader can see). */
  private[graft] def stageVersion(spark: SparkSession, path: String, batch: DataFrame,
                                  nBuckets: Int = 16): StagedVersion = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"upsertVersioned: no snapshot at $path"))
    val next = cur + 1
    val man = readManifestFull(spark, path, cur)
    val layout = layoutOf(spark, path, cur, nBuckets)
    // the batch plan feeds several consumers (touched-bucket probe,
    // relocation id probes, the staged write's new-rows side) — cache
    // it for the episode so a join-derived CDC batch is computed once,
    // not 3× (optimization r16, guide §1.2/§5); released before return
    val nv = batch.withColumn("bucket", bucketExpr(layout)).persist()
    // a null cluster value has no bin (the edge clamp would silently
    // drop it into bin 0 and escape every zone map) — fail fast. The
    // null probe rides the SAME job as the touched-bucket collect (a
    // per-bucket max-isNull aggregate), instead of paying one isEmpty
    // action per cluster column before any other work.
    val ccols = clusterCols(Some(layout))
    val probeAggs =
      if (ccols.nonEmpty) ccols.zipWithIndex.map { case (c, j) =>
        max(col(c).isNull.cast("int")).as(s"_null$j") }
      else Seq(count(lit(1)).as("_null0"))
    val touchedRows = nv.groupBy(col("owner"), col("bucket"))
      .agg(probeAggs.head, probeAggs.tail: _*).collect()
    ccols.zipWithIndex.foreach { case (c, j) =>
      require(!touchedRows.exists(_.getInt(2 + j) == 1),
        s"upsertVersioned: clustered layout on '$c' requires non-null values")
    }
    val newTouched = touchedRows.map(r => (r.getString(0), r.getLong(1))).toSeq
    require(newTouched.nonEmpty, "upsertVersioned: empty batch")
    // Under a clustered layout (bucket = f(cluster value), not
    // f(doc_id)) an updated doc whose cluster value moved bins leaves
    // its prior copy in a bucket the batch's NEW values never touch —
    // anti-joining only new-value buckets would silently duplicate it.
    // Locate prior copies with a doc_id-only probe of the remaining
    // buckets (parquet reads just the doc_id column; owner/bucket are
    // partition dirs) and rewrite those buckets too. HashLayout pins
    // the bucket NUMBER (f(doc_id)) but the partition key is
    // (owner, bucket): an upsert that changes a doc's OWNER would
    // strand the old copy under the old owner — so hash probes the
    // same bucket numbers under OTHER owners (bounded by
    // owners x batch-buckets, never a table scan).
    var probedBuckets = -1 // pruning evidence for the spec
    val relocated: Seq[(String, Long)] = layout match {
      case HashLayout(_) =>
        val newSet = newTouched.toSet
        val batchBuckets = newTouched.map(_._2).toSet
        val crossOwner = man.filter(e =>
          batchBuckets(e.bucket) && !newSet((e.owner, e.bucket)))
        probedBuckets = crossOwner.size
        if (crossOwner.isEmpty) Nil
        else scanEntries(spark, path, crossOwner)
          .select("owner", "bucket", "doc_id")
          .join(broadcast(nv.select("doc_id").distinct()), Seq("doc_id"), "left_semi")
          .select("owner", "bucket").distinct()
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      case _ =>
        val newSet = newTouched.toSet
        val rest0 = man.filterNot(e => newSet((e.owner, e.bucket)))
        // a doc_id bloom index prunes the probe driver-side: only
        // buckets whose filter claims at least one batch id need the
        // scan — at 100 TB this turns a table-wide doc_id-column read
        // into a handful of bucket dirs (false positives just scan)
        val rest = readBloomConfig(spark, path, cur) match {
          case Some(cfg) if cfg.col == "doc_id" && rest0.nonEmpty =>
            val ids = nv.select(col("doc_id").cast("string")).distinct()
              .limit(65537).collect().map(_.getString(0))
            if (ids.length > 65536) rest0 // batch too large to probe cheaply
            else {
              val idBits = ids.map(probeBits(_, cfg))
              rest0.filter(e => e.bloom.forall(h =>
                idBits.exists(_.forall(bloomHas(h, _)))))
            }
          case _ => rest0
        }
        probedBuckets = rest.size
        if (rest.isEmpty) Nil
        else scanEntries(spark, path, rest)
          .select("owner", "bucket", "doc_id")
          .join(broadcast(nv.select("doc_id").distinct()), Seq("doc_id"), "left_semi")
          .select("owner", "bucket").distinct()
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val touched = newTouched ++ relocated
    val touchedSet = touched.toSet
    // Writer isolation (round-12 task 6): stage under a fresh unique
    // w=<wid> subdir instead of the bare v=next dir. A crashed
    // attempt's retry writes a NEW wid (no orphan cleanup needed — the
    // old attempt's w-dir is referenced by no manifest, invisible to
    // readers, reclaimed by vacuum), and a CONCURRENT writer racing
    // the same bucket stages a disjoint dir: its data can never mix
    // into this writer's audit or committed snapshot. Exactly one of
    // the racers wins commitManifestFull's atomic publish; the loser
    // gets ConcurrentModificationException, never silent last-wins.
    // (The previous design deleted "orphan" v=next dirs here, which
    // would have destroyed a live concurrent writer's staged data.)
    val wid = newWid()
    // survivors via the dv-applying scan: a rewrite FOLDS a bucket's
    // delete vector into the new data version (and clears the ref)
    val touchedEntries = man.filter(e => touchedSet((e.owner, e.bucket)))
    val content =
      if (touchedEntries.isEmpty) nv
      else {
        val survivors = scanEntries(spark, path, touchedEntries)
          .join(broadcast(nv.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
        // allowMissingColumns = schema evolution: a batch may ADD
        // columns (survivors read NULL for them); a batch missing an
        // existing column evolves it to NULL for the new rows
        survivors.unionByName(nv.drop("v"), allowMissingColumns = true)
      }
    // TWO actions stage everything (was four: localCheckpoint +
    // per-bucket count + write, plus the checkpoint's block copy): the
    // staged plan is cached, the audit's expected count reads the
    // cache (write-independent intent, same guarantee the checkpoint
    // gave), the write re-reads the cache, and the surviving bucket
    // set comes back from the write's own partition dirs — relocation
    // can EMPTY a bucket (its only rows moved to other bins): no
    // v=next dir is written for it, so its manifest entry must vanish
    // rather than point at a missing path (optimization r16, §1.2).
    val staged = content.withColumn("v", lit(next))
      .repartition(touched.size, col("owner"), col("bucket"))
      .persist()
    val expected = staged.count()
    val live = writeStaged(staged, path, wid)
    staged.unpersist()
    nv.unpersist()
    val entries = man.filterNot(e => touchedSet((e.owner, e.bucket))) ++
      live.map { case (o, b) =>
        ManifestEntry(o, b, next, None, wid = Some(wid)) }
    StagedVersion(next, expected, live, entries, Some(layout),
      readBloomConfig(spark, path, cur), probedBuckets, Some(wid))
  }

  /** Audit the staged version dirs (row count + bucket set), then
    * commit — one rename flips every touched bucket at once. Under a
    * range layout the SAME audit read also recomputes the touched
    * buckets' zone maps (min/max of the cluster column over the
    * staged content — no extra pass; untouched buckets keep theirs). */
  private[graft] def auditAndCommit(spark: SparkSession, path: String,
                                    st: StagedVersion): Unit = {
    val paths = st.touched.map { case (o, b) =>
      bucketDir(path, o, b, st.next) +
        st.wid.map(w => s"/w=$w").getOrElse("") }
    // one disk read serves both the audit aggregate and the bloom
    // recompute below (cached only when a bloom config exists —
    // otherwise the single consumer needs no cache)
    val stagedRead = spark.read.option("basePath", dataDir(path)).parquet(paths: _*)
    val shared = if (st.bloom.isDefined) stagedRead.persist() else stagedRead
    try auditBody(spark, path, st, shared)
    finally if (st.bloom.isDefined) shared.unpersist(): Unit
  }

  /** [[auditAndCommit]]'s body, split out so the audit cache releases
    * on ANY exit (ADVICE r16: a failed require / bloomHexOf error used
    * to leak the persisted staged read for the session). */
  private def auditBody(spark: SparkSession, path: String,
                        st: StagedVersion,
                        shared: org.apache.spark.sql.DataFrame): Unit = {
    val statsCols = clusterCols(st.layout)
    val aggs = count(lit(1)).as("cnt") +: statsCols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c).cast("double")).as(s"smn$j"),
        max(col(c).cast("double")).as(s"smx$j")) }
    val perPartRows = shared
      .groupBy(col("owner"), col("bucket").cast("long").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val perPart = perPartRows.map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val gotRows = perPart.map(_._2).sum
    require(gotRows == st.expectedRows,
      s"versioned audit: staged $gotRows rows, expected ${st.expectedRows}")
    require(perPart.map(_._1).toSet == st.touched.toSet,
      s"versioned audit: staged buckets ${perPart.map(_._1).toSet} != ${st.touched.toSet}")
    val entries =
      if (statsCols.isEmpty) st.entries
      else {
        val statsMap = perPartRows.map(r =>
          ((r.getString(0), r.getLong(1)),
            statsCols.indices.map(j =>
              (r.getDouble(3 + 2 * j), r.getDouble(4 + 2 * j))))).toMap
        st.entries.map(e => statsMap.get((e.owner, e.bucket)) match {
          case Some(ss) if e.v == st.next =>
            e.copy(stats = Some(ss.head),
              stats2 = if (ss.size > 1) Some(ss(1)) else None)
          case _ => e
        })
      }
    // bloom maintenance: touched buckets get filters recomputed over
    // their full staged content (untouched keep theirs)
    val entries2 = st.bloom match {
      case Some(cfg) =>
        val bl = bloomHexOf(shared, cfg) // cache released by the caller's finally
        entries.map(e =>
          if (e.v == st.next) e.copy(bloom = bl.get((e.owner, e.bucket))) else e)
      case None => entries
    }
    commitManifestFull(spark, path, st.next, entries2, st.layout, st.bloom)
  }

  /** Doc-granular upsert as a new snapshot: stage → audit → commit.
    * Re-running after ANY crash converges: pre-commit crashes leave
    * the old snapshot live (orphan v-dirs are overwritten by the
    * retry's append of identical content under the same v — then
    * superseded when the retry commits). */
  def upsertVersioned(spark: SparkSession, path: String, batch: DataFrame,
                      nBuckets: Int = 16): Unit = {
    // orphan v=next cleanup happens inside stageVersion, where the
    // full touched set (incl. relocated-copy buckets) is known
    val st = stageVersion(spark, path, batch, nBuckets)
    auditAndCommit(spark, path, st)
  }

  /** OPTIMIZE-style layout maintenance: rewrite the CURRENT snapshot's
    * content under a NEW bucket count, committed as the next snapshot
    * through the same stage → audit → one-rename path as an upsert.
    * Content is untouched — only the (owner, bucket) layout changes —
    * so readers of the new snapshot see byte-identical rows, and every
    * PRIOR snapshot still time-travels against the old layout until
    * vacuumed (the manifest is the layout: each snapshot's entries
    * carry their own bucket space, so mixed-layout history is fine).
    *
    * This is the lakehouse rebucketing problem (Iceberg's
    * REPLACE PARTITION FIELD / bucket-transform evolution): a bucket
    * count chosen at table creation is wrong after 100× growth — too
    * few buckets means giant files and no upsert parallelism. Because
    * the store prunes scans and isolates upserts BY bucket, scaling
    * the bucket count must be atomic across the whole table, which is
    * exactly what the manifest rename gives. The rewrite itself is one
    * full-table shuffle on the new (owner, bucket) — the unavoidable
    * cost, paid once, off the write path. Crash-safe like upsert:
    * pre-commit crashes leave orphan v-dirs no reader sees; a retry
    * clears them and converges. */
  def compact(spark: SparkSession, path: String, newBuckets: Int): Unit = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"compact: no snapshot at $path"))
    val next = cur + 1
    // one snapshot scan serves the touched-bucket probe AND the staged
    // write; the write's row count is observed in-job (optimization
    // r16, guide §1.2 — was: scan → collect, localCheckpoint, count,
    // write = 3 full-corpus evaluations)
    val nv = readSnapshot(spark, path, cur).drop("bucket")
      .withColumn("bucket", IndexPipeline.docBucket(col("doc_id"), newBuckets))
      .persist()
    val touched = nv.select("owner", "bucket").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val wid = newWid() // writer-isolated staging; see stageVersion
    val staged = nv.withColumn("v", lit(next))
      .repartition(touched.size, col("owner"), col("bucket"))
      .persist()
    val expected = staged.count()
    writeStaged(staged, path, wid)
    staged.unpersist()
    nv.unpersist()
    // full rewrite: the new manifest carries ONLY the new bucket space
    auditAndCommit(spark, path, StagedVersion(next, expected, touched,
      touched.map { case (o, b) =>
        ManifestEntry(o, b, next, None, wid = Some(wid)) },
      Some(HashLayout(newBuckets)), readBloomConfig(spark, path, cur),
      wid = Some(wid)))
  }

  /** CLUSTERING compaction — the OPTIMIZE-ZORDER move: rewrite the
    * current snapshot RANGE-bucketed on `statsCol` (fixed-width bins
    * over the column's [min, max], frozen into the manifest's layout
    * header) and record each bucket's zone map (min/max of the
    * column) in its manifest entry. After this, `readSnapshotRange`
    * plans scans over ONLY the buckets whose zone map overlaps the
    * predicate — at 100 TB a selective range query touches a handful
    * of bucket dirs instead of the table. Later upserts keep the
    * layout: new rows are binned by the frozen boundaries (clamped at
    * the edges) and the touched buckets' zone maps are recomputed in
    * the upsert's own audit read, so skipping stays sound under
    * churn. Because a clustered bucket is f(cluster value), not
    * f(doc_id), an update that moves a doc across bins must also
    * rewrite the bucket holding the PRIOR copy — stageVersion locates
    * those with a doc_id-only probe of the unaffected buckets (bloom-
    * pruned when a doc_id index exists) and folds them into the same
    * atomic commit; buckets emptied by the move leave the manifest.
    * Same stage → audit → one-rename crash safety as every
    * other rewrite; prior snapshots time-travel against their own
    * layout until vacuumed. */
  def compactClustered(spark: SparkSession, path: String, statsCol: String,
                       newBuckets: Int): Unit = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"compactClustered: no snapshot at $path"))
    val next = cur + 1
    // one snapshot scan (cached for the episode) serves the null check
    // + range agg, the touched probe, and the staged write — was 4
    // full-corpus evaluations (optimization r16, guide §1.2). The null
    // check rides the range aggregate: count(statsCol) counts only
    // non-null values, so a null sneaks nothing past the zone maps.
    val base = readSnapshot(spark, path, cur).drop("bucket").persist()
    val Row(nAll: Long, nCol: Long, mnN: Any, mxN: Any) = base.agg(
      count(lit(1)), count(col(statsCol)),
      min(col(statsCol).cast("double")), max(col(statsCol).cast("double"))).head()
    // an empty snapshot (reachable after a delete that empties every
    // bucket) yields null min/max, which the Any match below would
    // silently unbox to 0.0 and build a degenerate RangeLayout(0,0) —
    // fail here with the real cause instead (ADVICE r16)
    require(nAll > 0, "compactClustered: empty snapshot — nothing to cluster")
    require(nCol == nAll,
      s"compactClustered: cluster column '$statsCol' must be non-null")
    val (mnA, mxA) = (mnN.asInstanceOf[Double], mxN.asInstanceOf[Double])
    val layout = RangeLayout(statsCol, mnA, mxA, newBuckets)
    val nv = base.withColumn("bucket", bucketExpr(layout))
    val touched = nv.select("owner", "bucket").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val wid = newWid() // writer-isolated staging; see stageVersion
    val staged = nv.withColumn("v", lit(next))
      .repartition(touched.size, col("owner"), col("bucket"))
      .persist()
    val expected = staged.count()
    writeStaged(staged, path, wid)
    staged.unpersist()
    base.unpersist()
    auditAndCommit(spark, path, StagedVersion(next, expected, touched,
      touched.map { case (o, b) =>
        ManifestEntry(o, b, next, None, wid = Some(wid)) },
      Some(layout), readBloomConfig(spark, path, cur), wid = Some(wid)))
  }

  /** Doc-granular DELETE as a new snapshot — the right-to-be-forgotten
    * primitive: rewrite only the buckets that hold the victim docs,
    * anti-joined against the id set, through the same stage → audit →
    * one-rename path as an upsert. Buckets left EMPTY by the delete
    * drop out of the manifest entirely (no zero-row dirs); untouched
    * buckets keep their live version dirs byte-identical, so the CDC
    * feed between the two snapshots shows ONLY deletes. Crash-safe
    * like upsert: pre-commit crashes leave orphan v-dirs no reader
    * sees; a retry clears them and converges. Returns the number of
    * vector rows removed. */
  def deleteVersioned(spark: SparkSession, path: String, docIds: DataFrame,
                      nBuckets: Int = 16): Long = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"deleteVersioned: no snapshot at $path"))
    val next = cur + 1
    val ids = docIds.select(col("doc_id")).distinct()
    val snap = readSnapshot(spark, path, cur)
    val victims = snap.join(broadcast(ids), Seq("doc_id"), "left_semi")
    // ONE job learns both the touched bucket set and the removed-row
    // total (was: distinct-collect + count = two snapshot-scan jobs —
    // optimization r16, guide §1.2)
    val vb = victims.groupBy(col("owner"), col("bucket").cast("long").as("bucket"))
      .count().collect()
    val touched = vb.map(r => (r.getString(0), r.getLong(1))).toSeq
    if (touched.isEmpty) return 0L
    val deleted = vb.map(_.getLong(2)).sum
    val man = readManifestFull(spark, path, cur)
    val touchedSet = touched.toSet
    val wid = newWid() // writer-isolated staging; see stageVersion
    // dv-applying scan: the rewrite folds any existing delete vector
    // of a touched bucket into the new data version. The staged plan
    // is cached across its two actions (count + write), and buckets
    // fully emptied by the delete write no dir (writeStaged's moved
    // set is the kept set) and leave the manifest — no separate
    // kept-distinct collect.
    val staged = scanEntries(spark, path,
        man.filter(e => touchedSet((e.owner, e.bucket))))
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
      .withColumn("v", lit(next))
      .repartition(touched.size, col("owner"), col("bucket"))
      .persist()
    val expected = staged.count()
    val kept = writeStaged(staged, path, wid)
    staged.unpersist()
    val entries = man.filterNot(e => touchedSet((e.owner, e.bucket))) ++
      kept.map { case (o, b) =>
        ManifestEntry(o, b, next, None, wid = Some(wid)) }
    val layout = readLayout(spark, path, cur)
    val bloomCfg = readBloomConfig(spark, path, cur)
    if (kept.isEmpty) commitManifestFull(spark, path, next, entries, layout, bloomCfg)
    else auditAndCommit(spark, path,
      StagedVersion(next, expected, kept, entries, layout, bloomCfg,
        wid = Some(wid)))
    deleted
  }

  /** MERGE-ON-READ soft delete — the Iceberg-v2 delete-vector
    * strategy, the write-cheap counterpart of `deleteVersioned`'s
    * copy-on-write rewrite: instead of rewriting the touched buckets,
    * write one small id file per affected (owner, bucket) under
    * `deletes/dv=<next>/` and commit a manifest whose affected entries
    * keep their data version but gain a `dv:<next>` reference. Readers
    * subtract the dv at scan time (cost ∝ deleted ids); a later
    * upsert/rewrite of the bucket folds the dv in and clears the ref.
    * Repeated soft deletes are CUMULATIVE: the new dv file carries the
    * union of the bucket's old dv ids and the new victims, so each
    * entry references exactly one dv generation. At 100 TB this is
    * what makes frequent small deletes affordable — O(deleted ids)
    * written, zero data movement, amortized into the next natural
    * rewrite. Returns the number of visible vector rows removed. */
  def softDelete(spark: SparkSession, path: String, docIds: DataFrame): Long = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"softDelete: no snapshot at $path"))
    val next = cur + 1
    val ids = docIds.select(col("doc_id")).distinct()
    val man = readManifestFull(spark, path, cur)
    // Locate victims by PRUNED scan, never a full-table read (found by
    // the BENCHDOC flatness legs: the readSnapshot-based locate made a
    // 6-victim delete 4.2× slower at 100× docs — O(table) file opens).
    // HashLayout derives the candidate bucket NUMBERS from the ids
    // themselves; other layouts use the doc_id bloom index when one
    // exists (same pruning stageVersion's relocation probe uses) and
    // scan conservatively otherwise.
    val candidates = layoutOf(spark, path, cur, 16) match {
      case HashLayout(nb) =>
        val bset = ids.select(pmod(col("doc_id"), lit(nb.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0)).toSet
        man.filter(e => bset(e.bucket))
      case _ => readBloomConfig(spark, path, cur) match {
        case Some(cfg) if cfg.col == "doc_id" =>
          val idv = ids.select(col("doc_id").cast("string"))
            .limit(65537).collect().map(_.getString(0))
          if (idv.length > 65536) man
          else {
            val idBits = idv.map(probeBits(_, cfg))
            man.filter(e => e.bloom.forall(h =>
              idBits.exists(_.forall(bloomHas(h, _)))))
          }
        case _ => man
      }
    }
    if (candidates.isEmpty) return 0L
    val visible = scanEntries(spark, path, candidates)
    val victims = visible.join(broadcast(ids), Seq("doc_id"), "left_semi")
      .persist() // one pruned scan feeds both consumers (grouped probe
                 // + dv-id write); released below
    // ONE job learns the affected bucket set AND the removed-row total
    // (was: localCheckpoint + distinct-collect + count = three jobs —
    // optimization r16, guide §1.2)
    val vb = victims.groupBy(col("owner"), col("bucket").cast("long").as("bucket"))
      .count().collect()
    val affected = vb.map(r => (r.getString(0), r.getLong(1))).toSeq
    if (affected.isEmpty) { victims.unpersist(); return 0L }
    val removed = vb.map(_.getLong(2)).sum
    val affectedSet = affected.toSet
    // cumulative: union the affected buckets' existing dv ids in
    val oldEntries = man.filter(e =>
      e.dv.isDefined && affectedSet((e.owner, e.bucket)))
    val newVictimIds = victims.select("owner", "bucket", "doc_id").distinct()
    val allIds =
      if (oldEntries.isEmpty) newVictimIds
      else newVictimIds.unionByName(
        readDvEntries(spark, path, oldEntries)).distinct()
    // writer-isolated dv staging (same discipline as writeStaged): a
    // fresh w=<dvw> subdir per attempt, written via a writer-private
    // staging root + one rename, so a concurrent soft delete racing
    // this snapshot can never replace this writer's id files — the
    // loser's dir is simply never referenced. Crash-retry converges
    // the same way: the retry writes a new subdir and the orphan is
    // vacuumable.
    val dvw = newWid()
    val dvStaging = s"${deletesDir(path)}/.staging-$dvw"
    allIds.repartition(affected.size, col("owner"), col("bucket"))
      .write.mode("overwrite").partitionBy("owner", "bucket")
      .parquet(dvStaging)
    victims.unpersist()
    val fs = fsOf(spark, path)
    val dvTarget = new Path(s"${dvDir(path, next)}/w=$dvw")
    fs.mkdirs(dvTarget.getParent)
    if (!fs.rename(new Path(dvStaging), dvTarget))
      throw new IllegalStateException(
        s"softDelete: move $dvStaging -> $dvTarget failed")
    // zone maps untouched: a delete only shrinks a bucket's content,
    // so its recorded (min, max) stays a sound over-approximation
    val entries = man.map(e =>
      if (affectedSet((e.owner, e.bucket)))
        e.copy(dv = Some(next), dvw = Some(dvw)) else e)
    commitManifestFull(spark, path, next, entries, readLayout(spark, path, cur),
      readBloomConfig(spark, path, cur))
    removed
  }

  /** Read a snapshot (default: latest). Plans a scan over exactly the
    * manifest's version dirs — no discovery, orphan dirs invisible. */
  def readSnapshot(spark: SparkSession, path: String, snapshot: Int = -1): DataFrame = {
    val snap = if (snapshot > 0) snapshot
    else currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"readSnapshot: no snapshot at $path"))
    // a vacuumed (or never-committed) snapshot must fail CLEANLY here —
    // a descriptive error naming what is still readable — never reach
    // the scan and surface a partial read or a raw FileNotFound
    if (snapshot > 0 && !fsOf(spark, path).exists(
        new Path(manifestFile(path, snap))))
      throw new IllegalStateException(
        s"readSnapshot: snapshot $snap at $path is not readable " +
          s"(vacuumed or never committed); retained snapshots: " +
          s"${snapshots(spark, path).mkString(", ")}")
    scanEntries(spark, path, readManifestFull(spark, path, snap))
  }

  /** ZONE-MAP-PRUNED range read over the cluster column: scan only
    * the manifest entries whose recorded (min, max) overlaps
    * [lo, hi] — entries with no stats are scanned conservatively —
    * then apply the residual predicate. Returns the filtered rows
    * plus (buckets scanned, buckets total), the pruning evidence the
    * `s19_zonemap_skip` gate pins. Requires a range layout (the
    * cluster column's name lives in the layout header). */
  def rangeScan(spark: SparkSession, path: String, lo: Double, hi: Double,
                snapshot: Int = -1): (DataFrame, Int, Int) = {
    val snap = if (snapshot > 0) snapshot
    else currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"rangeScan: no snapshot at $path"))
    val statsCol = readLayout(spark, path, snap) match {
      case Some(RangeLayout(c, _, _, _)) => c
      case other => throw new IllegalStateException(
        s"rangeScan: snapshot $snap has no range layout (found $other) — " +
          "run compactClustered first")
    }
    val entries = readManifestFull(spark, path, snap)
    val scanned = entries.filter(_.stats match {
      case Some((mn, mx)) => !(mx < lo || mn > hi)
      case None => true
    })
    val rows =
      if (scanned.isEmpty) {
        // degenerate but legal: nothing overlaps — an empty relation
        // with the snapshot's schema
        scanEntries(spark, path, entries).filter(lit(false))
      } else scanEntries(spark, path, scanned)
    (rows.filter(col(statsCol).cast("double").between(lo, hi)),
      scanned.size, entries.size)
  }

  def readSnapshotRange(spark: SparkSession, path: String, lo: Double,
                        hi: Double, snapshot: Int = -1): DataFrame =
    rangeScan(spark, path, lo, hi, snapshot)._1

  /** Z-ORDER clustering compaction (Delta's OPTIMIZE ZORDER proper):
    * rewrite the current snapshot bucketed by contiguous bands of the
    * 2-D interleaved-bit curve over (colX, colY) — frozen fixed-width
    * bins per dim — and record TWO zone maps per bucket. After this,
    * `boxScan` prunes every bucket whose (x, y) rectangle misses a
    * box predicate: the 2-D selectivity single-column clustering
    * cannot give. Upserts keep the layout (frozen bins, edge clamp)
    * and both zone maps are recomputed in the audit read. nBuckets
    * must divide 4^bits. */
  def compactZOrdered(spark: SparkSession, path: String, colX: String,
                      colY: String, nBuckets: Int, bits: Int = 5): Unit = {
    require((1L << (2 * bits)) % nBuckets == 0,
      s"nBuckets=$nBuckets must divide 4^bits=${1L << (2 * bits)}")
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"compactZOrdered: no snapshot at $path"))
    val next = cur + 1
    val base = readSnapshot(spark, path, cur).drop("bucket")
    Seq(colX, colY).foreach(c => require(base.filter(col(c).isNull).isEmpty,
      s"compactZOrdered: cluster column '$c' must be non-null"))
    val Row(mnx: Double, mxx: Double, mny: Double, mxy: Double) = base.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    val layout = ZLayout(colX, colY, mnx, mxx, mny, mxy, bits, nBuckets)
    val nv = base.withColumn("bucket", bucketExpr(layout))
    val touched = nv.select("owner", "bucket").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val wid = newWid() // writer-isolated staging; see stageVersion
    val staged = nv.withColumn("v", lit(next))
      .repartition(touched.size, col("owner"), col("bucket"))
      .localCheckpoint()
    val expected = staged.count()
    writeStaged(staged, path, wid)
    auditAndCommit(spark, path, StagedVersion(next, expected, touched,
      touched.map { case (o, b) =>
        ManifestEntry(o, b, next, None, wid = Some(wid)) },
      Some(layout), readBloomConfig(spark, path, cur), wid = Some(wid)))
  }

  /** 2-D ZONE-MAP-PRUNED box read over a z-ordered table: scan only
    * the buckets whose (x, y) rectangle overlaps the box, then apply
    * the residual predicate. Returns the rows plus (buckets scanned,
    * buckets total). */
  def boxScan(spark: SparkSession, path: String, loX: Double, hiX: Double,
              loY: Double, hiY: Double, snapshot: Int = -1): (DataFrame, Int, Int) = {
    val snap = if (snapshot > 0) snapshot
    else currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"boxScan: no snapshot at $path"))
    val (cx, cy) = readLayout(spark, path, snap) match {
      case Some(ZLayout(x, y, _, _, _, _, _, _)) => (x, y)
      case other => throw new IllegalStateException(
        s"boxScan: snapshot $snap has no z-order layout (found $other) — " +
          "run compactZOrdered first")
    }
    val entries = readManifestFull(spark, path, snap)
    def overlaps(st: Option[(Double, Double)], lo: Double, hi: Double) =
      st match { case Some((mn, mx)) => !(mx < lo || mn > hi); case None => true }
    val scanned = entries.filter(e =>
      overlaps(e.stats, loX, hiX) && overlaps(e.stats2, loY, hiY))
    val rows =
      if (scanned.isEmpty) scanEntries(spark, path, entries).filter(lit(false))
      else scanEntries(spark, path, scanned)
    (rows.filter(col(cx).cast("double").between(loX, hiX) &&
      col(cy).cast("double").between(loY, hiY)), scanned.size, entries.size)
  }

  /** Build (or rebuild) per-bucket bloom filters over `colName` as a
    * METADATA-ONLY snapshot: data versions unchanged, every entry
    * gains its filter, the header records the config. One scan of the
    * current content, O(buckets × mBits/8) driver state, one rename.
    * From then on every rewrite maintains the filters (touched
    * buckets recomputed inside the audit), so the index never goes
    * stale. */
  def buildBloomIndex(spark: SparkSession, path: String, colName: String,
                      mBits: Int = 1024, k: Int = 3): Unit = {
    require(mBits % 8 == 0 && mBits > 0, s"mBits must be a positive multiple of 8")
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"buildBloomIndex: no snapshot at $path"))
    val cfg = BloomConfig(colName, mBits, k)
    val entries = readManifestFull(spark, path, cur)
    val bl = bloomHexOf(scanEntries(spark, path, entries), cfg)
    commitManifestFull(spark, path, cur + 1,
      entries.map(e => e.copy(bloom = bl.get((e.owner, e.bucket)))),
      readLayout(spark, path, cur), Some(cfg))
  }

  /** BLOOM-PRUNED equality lookup on the indexed column: scan only
    * the buckets whose filter claims the value (false positives are
    * scanned and filtered away; entries without a filter are scanned
    * conservatively), then apply the residual predicate. Returns the
    * matching rows plus (buckets scanned, buckets total) — the
    * pruning evidence the `s21_bloom_skip` gate pins. At 100 TB this
    * turns a non-key point lookup from a full-table scan into a
    * handful of bucket dirs. */
  def lookupEq(spark: SparkSession, path: String, value: String,
               snapshot: Int = -1): (DataFrame, Int, Int) = {
    val snap = if (snapshot > 0) snapshot
    else currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"lookupEq: no snapshot at $path"))
    val cfg = readBloomConfig(spark, path, snap).getOrElse(
      throw new IllegalStateException(
        s"lookupEq: snapshot $snap has no bloom index — run buildBloomIndex first"))
    val entries = readManifestFull(spark, path, snap)
    val bits = probeBits(value, cfg)
    val scanned = entries.filter(e =>
      e.bloom.forall(h => bits.forall(b => bloomHas(h, b))))
    val rows =
      if (scanned.isEmpty) scanEntries(spark, path, entries).filter(lit(false))
      else scanEntries(spark, path, scanned)
    (rows.filter(col(cfg.col).cast("string") === value), scanned.size, entries.size)
  }

  /** Scan exactly `entries`' data dirs and subtract their delete
    * vectors (one anti-join against the referenced dv files — the
    * merge-on-read cost, proportional to the DELETED ids, not the
    * table). */
  /** The (owner, bucket, doc_id) delete-vector rows the given entries
    * reference. Wid-era and legacy dv dirs sit at DIFFERENT partition
    * depths (dv=k/w=x/owner/bucket vs dv=k/owner/bucket) and Spark's
    * partition discovery rejects mixed depths in one read — split by
    * shape and union. */
  private def readDvEntries(spark: SparkSession, path: String,
                            entries: Seq[ManifestEntry]): DataFrame = {
    def read(es: Seq[ManifestEntry]): Option[DataFrame] =
      if (es.isEmpty) None
      else Some(withDriverSideListing(spark) {
        spark.read.option("basePath", deletesDir(path))
          .parquet(es.map(dvRefDir(path, _)): _*)
      }.select(col("owner"), col("bucket").cast("long").as("bucket"),
          col("doc_id")))
    val (w, legacy) = entries.filter(_.dv.isDefined).partition(_.dvw.isDefined)
    (read(w), read(legacy)) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b).getOrElse(
        throw new IllegalArgumentException("readDvEntries: no dv entries"))
    }
  }

  /** Merged-schema cache for manifest-planned reads. A committed
    * version dir is IMMUTABLE (writes stage under fresh wids, commits
    * rename, vacuum only deletes unreferenced dirs), so the merged
    * schema of an exact dir list never changes — but mergeSchema
    * inference launches one distributed footer-read job per
    * `spark.read`, and an episode composite replays the same snapshot
    * read dozens of times (measured: 28 of x15_cdc_mirror's 86 jobs
    * were schema-merge jobs). First read infers and caches; repeats
    * pass the schema explicitly — zero metadata jobs (optimization
    * r17, guide §1.2). Driver state is bounded: one small StructType
    * per distinct dir list. */
  private val mergedSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Manifest-planned reads pass a BOUNDED, already-known dir list
    * (≤ owners × buckets entries — the manifest IS the listing, the
    * table-format argument of guide §6), yet Spark launches a
    * distributed listing job whenever more than
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` (32)
    * paths are passed — one scheduler round-trip per snapshot read,
    * ~10-30 such jobs per episode composite (measured in x15/x14).
    * Scope driver-side listing to exactly these reads; the bound is
    * parameterised (`spark.graft.manifestListingThreshold`, default
    * 4096) for deployments whose object-store listing latency makes
    * the distributed listing worthwhile at very high bucket counts. */
  private def withDriverSideListing[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val bound = spark.conf.getOption("spark.graft.manifestListingThreshold")
      .getOrElse("4096")
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, bound)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private[graft] def scanEntries(spark: SparkSession, path: String,
                          entries: Seq[ManifestEntry]): DataFrame = {
    // mergeSchema: a snapshot may span version dirs written before and
    // after a column was ADDED (schema evolution) — the union schema
    // is the snapshot's schema, old rows read NULL for new columns.
    // Wid-era dirs (…/v=N/w=x) and legacy dirs (…/v=N) sit at
    // different partition depths, which one parquet() call rejects
    // ("conflicting directory structures") — split by shape, union.
    def read(es: Seq[ManifestEntry]): Option[DataFrame] =
      if (es.isEmpty) None
      else {
        val dirs = es.map(entryDir(path, _))
        // all files of one commit share one schema (one staged write),
        // so the merged schema is a function of the VERSION SET present
        // (plus the partition-dir shape) — subsets of a snapshot reuse
        // the full read's schema instead of re-inferring
        val key = path + "|" + es.map(_.v).distinct.sorted.mkString(",") +
          "|" + es.head.wid.isDefined
        val df = withDriverSideListing(spark) {
          val rdr = spark.read.option("basePath", dataDir(path))
          Option(mergedSchemaCache.get(key)) match {
            case Some(st) => rdr.schema(st).parquet(dirs: _*)
            case None =>
              val d = rdr.option("mergeSchema", "true").parquet(dirs: _*)
              // normalize the wid partition column to string before
              // caching: partition-type inference flips `w` to a
              // numeric type when a wid happens to be all digits, and
              // a later wid with hex letters would fail the cast —
              // the column is dropped right below, so its type only
              // has to ACCEPT every dir value
              mergedSchemaCache.put(key,
                org.apache.spark.sql.types.StructType(d.schema.fields.map(f =>
                  if (f.name == "w")
                    f.copy(dataType = org.apache.spark.sql.types.StringType)
                  else f)))
              d
          }
        }
        Some(df.withColumn("bucket", col("bucket").cast("long")).drop("v", "w"))
      }
    val (wids, legacy) = entries.partition(_.wid.isDefined)
    val base = (read(wids), read(legacy)) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (a, b) => a.orElse(b).getOrElse(
        throw new IllegalArgumentException("scanEntries: empty entry set"))
    }
    if (!entries.exists(_.dv.isDefined)) base
    else base.join(readDvEntries(spark, path, entries),
      Seq("owner", "bucket", "doc_id"), "left_anti")
  }

  /** Drop data dirs referenced by NO retained manifest (keep the last
    * `retain` snapshots). Returns deleted dir count.
    *
    * TAGS PIN SNAPSHOTS (Iceberg refs semantics): every snapshot a
    * `tag-*.txt` resolves to is unioned into the keep set before live
    * keys are computed, so a tagged audit/rollback point stays
    * readable by tag across any number of vacuums — retention only
    * expires UNREFERENCED history. Dropping the tag (dropTag) releases
    * the pin; the next vacuum reclaims it. */
  def vacuum(spark: SparkSession, path: String, retain: Int = 2): Int = {
    val fs = fsOf(spark, path)
    val snaps = snapshots(spark, path)
    val tagged = listTags(spark, path).values.toSet
    val keep = (snaps.takeRight(retain) ++ snaps.filter(tagged)).distinct.sorted
    val keepSet = keep.toSet
    val keptEntries = keep.flatMap(readManifestFull(spark, path, _))
    // live keys at the granularity an entry actually references:
    // owner=o/bucket=b/v=N for legacy entries, .../w=x for wid-era
    // ones — so an orphan w-dir beside a live sibling (a LOSING
    // concurrent writer's staging, or crashed-attempt debris) is
    // reclaimed without touching the winner's data
    val live = keptEntries.map(e =>
      s"owner=${e.owner}/bucket=${e.bucket}/v=${e.v}" +
        e.wid.map(w => s"/w=$w").getOrElse("")).toSet
    var deleted = 0
    // crashed writers leave .staging-<wid> roots (never referenced,
    // invisible to readers); vacuum reclaims them — same caveat as
    // version dirs: vacuum must not run concurrently with writers
    def sweepStaging(dir: Path): Unit =
      if (fs.exists(dir))
        for (d <- fs.listStatus(dir)
             if d.isDirectory && d.getPath.getName.startsWith(".staging-")) {
          fs.delete(d.getPath, true); deleted += 1
        }
    sweepStaging(new Path(dataDir(path)))
    sweepStaging(new Path(deletesDir(path)))
    val root = new Path(dataDir(path))
    if (fs.exists(root)) {
      for (oDir <- fs.listStatus(root)
           if oDir.isDirectory && !oDir.getPath.getName.startsWith(".");
           bDir <- fs.listStatus(oDir.getPath) if bDir.isDirectory;
           vDir <- fs.listStatus(bDir.getPath) if vDir.isDirectory) {
        val key = s"${oDir.getPath.getName}/${bDir.getPath.getName}/${vDir.getPath.getName}"
        if (!live.contains(key)) {
          val wDirs = fs.listStatus(vDir.getPath).filter(d =>
            d.isDirectory && d.getPath.getName.startsWith("w="))
          if (wDirs.isEmpty) { fs.delete(vDir.getPath, true); deleted += 1 }
          else {
            var keptW = 0
            for (wDir <- wDirs) {
              if (!live.contains(s"$key/${wDir.getPath.getName}")) {
                fs.delete(wDir.getPath, true); deleted += 1
              } else keptW += 1
            }
            if (keptW == 0 && fs.listStatus(vDir.getPath).isEmpty)
              fs.delete(vDir.getPath, true)
          }
        }
      }
      // drop superseded manifests (never a tagged one)
      snaps.filterNot(keepSet).foreach(n =>
        fs.delete(new Path(manifestFile(path, n)), false))
    }
    // reclaim delete-vector dirs no retained manifest references —
    // same two-shape walk (dv=k/w=x/owner/bucket vs dv=k/owner/bucket)
    val liveDv = keptEntries.collect {
      case e if e.dv.isDefined =>
        s"dv=${e.dv.get}" + e.dvw.map(w => s"/w=$w").getOrElse("") +
          s"/owner=${e.owner}/bucket=${e.bucket}"
    }.toSet
    val dRoot = new Path(deletesDir(path))
    if (fs.exists(dRoot)) {
      def sweepDvLeaf(prefix: String, dir: Path): Unit =
        for (oDir <- fs.listStatus(dir) if oDir.isDirectory;
             bDir <- fs.listStatus(oDir.getPath) if bDir.isDirectory) {
          val key = s"$prefix/${oDir.getPath.getName}/${bDir.getPath.getName}"
          if (!liveDv.contains(key)) { fs.delete(bDir.getPath, true); deleted += 1 }
        }
      for (kDir <- fs.listStatus(dRoot)
           if kDir.isDirectory && !kDir.getPath.getName.startsWith(".")) {
        val kName = kDir.getPath.getName
        for (child <- fs.listStatus(kDir.getPath) if child.isDirectory) {
          if (child.getPath.getName.startsWith("w="))
            sweepDvLeaf(s"$kName/${child.getPath.getName}", child.getPath)
          else {
            val key = s"$kName/${child.getPath.getName}"
            // legacy shape: child is owner=o, its children bucket=b
            for (bDir <- fs.listStatus(child.getPath) if bDir.isDirectory) {
              val bKey = s"$key/${bDir.getPath.getName}"
              if (!liveDv.contains(bKey)) { fs.delete(bDir.getPath, true); deleted += 1 }
            }
          }
        }
      }
    }
    deleted
  }

  /** Observability report — the DESCRIBE EXTENDED of the store: one
    * row per owner over the CURRENT snapshot, from the manifest (no
    * data read) plus one per-owner visible count and one dv-only scan
    * for masked rows. At 100 TB the visible count would come from
    * parquet footer row counts per bucket minus the dv cardinality;
    * the contract — one bounded row per owner — is the same. */
  def tableReport(spark: SparkSession, path: String): DataFrame = {
    val cur = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"tableReport: no snapshot at $path"))
    val man = readManifestFull(spark, path, cur)
    val layoutKind = readLayout(spark, path, cur) match {
      case Some(_: RangeLayout) => "range"
      case Some(_: ZLayout) => "z"
      case _ => "hash"
    }
    import spark.implicits._
    val entries = man.map(e => (e.owner, e.bucket, e.v, e.dv.isDefined,
        e.bloom.isDefined))
      .toDF("owner", "bucket", "v", "has_dv", "has_bloom")
    val perOwnerMan = entries.groupBy("owner")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("has_dv").cast("long")).as("n_dv_buckets"),
        sum(col("has_bloom").cast("long")).as("n_bloom_buckets"),
        max(col("v")).cast("long").as("max_data_version"))
    val visible = readSnapshot(spark, path, cur)
      .groupBy("owner").agg(count(lit(1)).as("n_visible"))
    val masked =
      if (!man.exists(_.dv.isDefined))
        entries.select(col("owner")).distinct().withColumn("n_masked", lit(0L))
      else readDvEntries(spark, path, man)
        .groupBy("owner").agg(count(lit(1)).as("n_masked"))
    perOwnerMan.join(visible, Seq("owner"), "left")
      .join(masked, Seq("owner"), "left")
      .na.fill(0L, Seq("n_visible", "n_masked"))
      .withColumn("snapshot", lit(cur.toLong))
      .withColumn("layout", lit(layoutKind))
      .select("owner", "n_buckets", "n_visible", "n_masked", "n_dv_buckets",
        "n_bloom_buckets", "max_data_version", "snapshot", "layout")
      .orderBy("owner")
  }
}
