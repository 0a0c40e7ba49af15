package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization => PQ}

/** Persisted serving state — the on-disk form of [[Serving.IndexState]]
  * (round-14 follow-through on "route from STORED index state"): one
  * directory holds every asset the router consults, so a serving
  * process opens it with [[load]] and gets routing + search without
  * re-deriving anything. Layout:
  *
  * {{{
  *   dir/byid/        REQUIRED — the raw corpus as a ByidStore
  *                    (point-fetch layout, CDC-maintained per x20);
  *                    doubles as the `vectors` relation AND the
  *                    rescore point-read source
  *   dir/cells/       optional — Search.ivfAssign output
  *   dir/encoded/     optional — PQ.pqEncode output (+ cell column)
  *   dir/words/       optional — Serving.signPackAll output
  *   dir/centroids/   optional — (tenant, cell, centroid) rows
  *   dir/codebooks/   optional — (tenant, s, c, codeword) rows
  *   dir/stats.txt    corpus_size + encoded_has_cells (the manifest
  *                    counters a real deployment keeps in its catalog)
  * }}}
  *
  * Driver-side maps (centroids, codebooks) round-trip through parquet
  * `array<double>` columns — bit-exact, so a saved+loaded state serves
  * hash-identical results (ServingSpec pins this). Cell and codeword
  * ids are dense (the engine's renumbering), so ordering by id
  * reconstructs the arrays losslessly.
  */
object ServingState {

  private def exists(p: String): Boolean = new File(p).exists()

  /** Persist the driver-side assets + stats. DataFrame assets
    * (cells / encoded / words / the byid store itself) are written by
    * their own builders; this records the broadcastable maps and the
    * catalog counters beside them. */
  def saveAssets(spark: SparkSession, dir: String,
                 centroids: Option[Map[String, Array[Array[Double]]]],
                 codebooks: Option[Map[String, PQ.Codebooks]],
                 corpusSize: Long, encodedHasCells: Boolean,
                 residualCodes: Boolean = false): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    centroids.foreach { m =>
      m.toSeq.flatMap { case (t, cents) =>
        cents.zipWithIndex.map { case (c, i) => (t, i, c.toSeq) }
      }.toDF("tenant", "cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    }
    codebooks.foreach { m =>
      m.toSeq.flatMap { case (t, books) =>
        books.toSeq.zipWithIndex.flatMap { case (cb, s) =>
          cb.toSeq.zipWithIndex.map { case (cw, c) => (t, s, c, cw.toSeq) }
        }
      }.toDF("tenant", "s", "c", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    }
    Files.writeString(Paths.get(dir, "stats.txt"),
      s"corpus_size=$corpusSize\nencoded_has_cells=$encodedHasCells\n" +
        s"residual_codes=$residualCodes\n")
  }

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

  /** Open a serving-state directory: discover which assets exist,
    * load the driver-side maps, read the catalog counters, and wire
    * the byid store in as BOTH the corpus relation and the rescore
    * point-read source. Column names of the stored relations must be
    * the canonical ones their builders produce (tenant/id/…). */
  def load(spark: SparkSession, dir: String,
           tenantCol: String = "tenant", idCol: String = "id",
           embCol: String = "embedding"): Serving.IndexState = {
    val byid = s"$dir/byid"
    require(ByidStore.segments(byid).nonEmpty,
      s"serving state at $dir has no byid store")
    val stats = Files.readString(Paths.get(dir, "stats.txt"))
    def stat(k: String): String =
      stats.linesIterator.collectFirst {
        case l if l.startsWith(k + "=") => l.stripPrefix(k + "=")
      }.getOrElse(throw new IllegalStateException(s"stats.txt missing $k"))
    Serving.IndexState(
      vectors = ByidStore.readAll(spark, byid, idCol),
      corpusSize = stat("corpus_size").toLong,
      centroids = if (exists(s"$dir/centroids"))
        Some(loadCentroids(spark, s"$dir/centroids")) else None,
      cells = if (exists(s"$dir/cells"))
        Some(spark.read.parquet(s"$dir/cells")) else None,
      codebooks = if (exists(s"$dir/codebooks"))
        Some(loadCodebooks(spark, s"$dir/codebooks")) else None,
      encoded = if (exists(s"$dir/encoded"))
        Some(spark.read.parquet(s"$dir/encoded")) else None,
      encodedHasCells = stat("encoded_has_cells").toBoolean,
      // older states (pre-residual) carry no key → raw codes
      residualCodes = stats.linesIterator
        .collectFirst { case l if l.startsWith("residual_codes=") =>
          l.stripPrefix("residual_codes=").toBoolean }.getOrElse(false),
      signWords = if (exists(s"$dir/words"))
        Some(spark.read.parquet(s"$dir/words")) else None,
      byidPath = Some(byid),
      tenantCol = tenantCol, idCol = idCol, embCol = embCol)
  }
}
