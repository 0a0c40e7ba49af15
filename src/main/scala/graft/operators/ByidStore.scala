package graft.operators

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC-maintained point-fetch store — O(churn) maintenance for the
  * id-keyed serving layout (round-13 verdict task 1).
  *
  * `Layout.pointFetchWrite` gives the rescore/get-by-ids path its
  * 192× byte win (id-sorted files, 8-row id pages, or-of-eq pushdown),
  * but as a ONE-TIME rewrite: under churn (the reference's upsert/
  * delete surface — `vector_db_service.py:165-261` upserts,
  * `documents.py` deletes) the layout goes stale, and re-running the
  * full rewrite after every batch is the same O(corpus) trap the IVF
  * assignment (x17) and PQ codes (x19) maintenance already avoid. This
  * store closes that gap with the classic LSM/Delta shape, kept
  * deliberately tiny because every reader is a bounded point fetch:
  *
  *  - BASE + DELTA SEGMENTS: `seg_NNNNN/` directories, each written in
  *    the point-fetch layout (id-sorted, 8-row pages). A CDC batch
  *    appends ONE delta segment holding only the batch's additions
  *    (inserts + update postimages) — cost ∝ churn, never corpus.
  *  - TOMBSTONES: `tomb_NNNNN/` holds the batch's removed ids
  *    (deletes + update preimages). A tombstone at batch b kills
  *    versions with seg < b; an update's own postimage (seg = b) and
  *    any later re-insert survive.
  *  - RESOLUTION (reader-side merge-on-read): a fetch reads EVERY
  *    segment with the same `Layout.idsPredicate` or-of-eq (each scan
  *    page-prunes to the candidate ids — K segments cost K bounded
  *    point reads, and K is capped by compaction), takes the max-seg
  *    version per id, then drops ids whose newest tombstone outranks
  *    that version.
  *  - COMPACTION: when the segment count passes the threshold,
  *    [[compact]] folds everything back into one base segment — the
  *    only O(corpus) action, paid once per `maxSegments` batches by
  *    choice, not per batch.
  *
  * Scale posture: applyCdc touches churn rows only (delta write +
  * tombstone write); fetch cost is segments × point-read, independent
  * of corpus size; compaction is scheduled, not forced. On a real
  * cluster the directory listing below becomes a manifest entry the
  * way VersionedStore tracks buckets — the local listing keeps this
  * module freestanding for the oracle gate (`x20_cdc_byid_maintain`)
  * and the BenchVec churn-flatness legs.
  */
object ByidStore {

  private def segDir(path: String, n: Int): String = f"$path/seg_$n%05d"
  private def tombDir(path: String, n: Int): String = f"$path/tomb_$n%05d"

  private def numbered(path: String, prefix: String): Seq[Int] = {
    val fs = Option(new File(path).listFiles()).getOrElse(Array.empty[File])
    fs.filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix).toInt).sorted.toSeq
  }

  /** Segment numbers present (base + deltas), ascending. */
  def segments(path: String): Seq[Int] = numbered(path, "seg_")

  /** Tombstone batch numbers present, ascending. */
  def tombstones(path: String): Seq[Int] = numbered(path, "tomb_")

  /** Bootstrap: write the full corpus as base segment 0 in the
    * point-fetch layout. The one intentionally O(corpus) call. */
  def init(df: DataFrame, idCol: String, path: String, nFiles: Int = 32): Unit = {
    require(segments(path).isEmpty, s"byid store at $path already initialized")
    Layout.pointFetchWrite(df, idCol, segDir(path, 0), nFiles)
  }

  /** Apply one CDC batch: `removals` (one `idCol` column — deletes +
    * update preimages) becomes a tombstone, `additions` (full payload
    * rows — inserts + update postimages) becomes a delta segment in
    * the point-fetch layout. Work is O(churn): neither side reads an
    * existing segment. Returns the batch number (0 if the batch was
    * empty and nothing was written). SINGLE-WRITER: batch numbering is
    * max-existing + 1, so concurrent appliers would collide — the CDC
    * feed is sequential by construction (VersionedStore snapshots are
    * optimistic-single-winner), and the streaming sink
    * (`streamByidMaintain`) serializes micro-batches. */
  def applyCdc(spark: SparkSession, path: String, removals: DataFrame,
               additions: DataFrame, idCol: String,
               deltaFiles: Int = 4): Int = {
    val batch = (segments(path) ++ tombstones(path)).foldLeft(0)(math.max) + 1
    val nAdd = additions.count()
    val nRem = removals.count()
    if (nAdd > 0)
      Layout.pointFetchWrite(additions, idCol, segDir(path, batch), deltaFiles)
    if (nRem > 0)
      removals.select(col(idCol).cast("long").as(idCol))
        .coalesce(1).write.mode("overwrite").parquet(tombDir(path, batch))
    if (nAdd > 0 || nRem > 0) batch else 0
  }

  /** [[applyCdc]] + scheduled compaction: fold back to one base when
    * the segment count passes `maxSegments` (fetch cost is
    * segments × point-read, so the threshold bounds read
    * amplification; the fold is the only O(corpus) action and this is
    * the one place that pays it). */
  def applyCdcAutoCompact(spark: SparkSession, path: String, removals: DataFrame,
                          additions: DataFrame, idCol: String,
                          maxSegments: Int = 8, deltaFiles: Int = 4,
                          compactFiles: Int = 32): Int = {
    val b = applyCdc(spark, path, removals, additions, idCol, deltaFiles)
    if (segments(path).size > maxSegments) compact(spark, path, idCol, compactFiles)
    b
  }

  /** The resolved logical view over ALL rows (no id pruning): max-seg
    * version per id, newest-tombstone-outranks filter. Used by
    * [[compact]]; fetches go through [[fetch]], which pushes the id
    * predicate into every segment scan first. */
  private def resolved(spark: SparkSession, path: String, idCol: String,
                       pred: Option[Column]): DataFrame = {
    val segs = segments(path)
    require(segs.nonEmpty, s"byid store at $path has no segments")
    // compacted store (one segment, no tombstones): no merge needed —
    // skip the row_number window entirely, so the common steady state
    // reads like a plain table (the window would SHUFFLE a full-view
    // read and add a per-row sort to point fetches for nothing)
    if (segs.size == 1 && tombstones(path).isEmpty) {
      val df = spark.read.parquet(segDir(path, segs.head))
      return pred.fold(df)(p => df.filter(p)).withColumn("seg", lit(segs.head))
    }
    val rows = segs.map { n =>
      val df = spark.read.parquet(segDir(path, n))
      pred.fold(df)(p => df.filter(p)).withColumn("seg", lit(n))
    }.reduce(_.unionByName(_))
    val latest = rows
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("seg").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val tombs = tombstones(path)
    if (tombs.isEmpty) latest
    else {
      val dead = tombs.map { n =>
        spark.read.parquet(tombDir(path, n)).withColumn("tseg", lit(n))
      }.reduce(_.unionByName(_))
        .groupBy(col(idCol)).agg(max(col("tseg")).as("tseg"))
      // tombstone batch b kills versions with seg < b; the same
      // batch's postimage (seg = b) and later re-inserts survive
      latest.join(broadcast(dead), Seq(idCol), "left")
        .filter(col("tseg").isNull || col("tseg") <= col("seg"))
        .drop("tseg")
    }
  }

  /** Point-fetch a bounded id list through the resolved view: every
    * segment scan gets the `Layout.idsPredicate` or-of-eq (page-pruned
    * to the candidates), the merge runs over ≤ segments × |ids| rows.
    * Output carries the payload columns plus `seg` (the segment that
    * served each row — physical provenance; x20 pins it to prove
    * updated rows come from the delta, not a stale base). */
  def fetch(spark: SparkSession, path: String, ids: Seq[Long],
            idCol: String): DataFrame =
    resolved(spark, path, idCol,
      Some(Layout.idsPredicate(col(idCol).cast("long"), ids)))

  /** The full resolved logical view (every live row, merge-on-read) —
    * the store AS a corpus relation, e.g. the `vectors` input of a
    * serving state. Point reads should use [[fetch]] instead: the
    * merge window blocks predicate pushdown, so filtering this view
    * decodes every segment. */
  def readAll(spark: SparkSession, path: String, idCol: String): DataFrame =
    resolved(spark, path, idCol, None)

  /** Fold all segments + tombstones back into one base segment
    * (numbered after the newest batch so later tombstones keep
    * outranking it). The only O(corpus) maintenance action. */
  def compact(spark: SparkSession, path: String, idCol: String,
              nFiles: Int = 32): Unit = {
    val newBase = (segments(path) ++ tombstones(path)).foldLeft(0)(math.max)
    val tmp = s"$path/_compact_tmp"
    Layout.pointFetchWrite(resolved(spark, path, idCol, None).drop("seg"),
      idCol, tmp, nFiles)
    (segments(path).map(segDir(path, _)) ++ tombstones(path).map(tombDir(path, _)))
      .foreach(p => deleteRecursively(new File(p)))
    val ok = new File(tmp).renameTo(new File(segDir(path, newBase)))
    require(ok, s"compact: rename $tmp failed")
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
