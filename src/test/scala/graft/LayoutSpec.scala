package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: the curve math and the thing it buys — a
  * two-dimensional predicate over z-laid-out files touches a small
  * subset of them, where a single-column sort only bounds its own
  * column. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.01"

  test("zCol interleaves bits (known values + driver replay)") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3) → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zCol(col("x"), col("y"), 3)).head().getLong(0)
    assert(z == 27L)
    // driver-side replay over a sample: bit b of x at 2b, of y at 2b+1
    def zLocal(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    val rows = Seq((0L, 0L), (1023L, 1023L), (7L, 512L), (800L, 13L))
    val got = rows.toDF("x", "y")
      .select(Layout.zCol(col("x"), col("y"), 10)).collect().map(_.getLong(0))
    rows.map { case (x, y) => zLocal(x, y, 10) }.zip(got).foreach { case (w, g) =>
      assert(w == g)
    }
  }

  test("two-dim predicate over a z-ordered table touches few files; bands bound both dims") {
    val root = Files.createTempDirectory("graft-zorder-")
    // dims normalized onto the shared 10-bit curve domain (z-order's
    // precondition — see zo_locality's comment)
    val ev = Tables.events(spark, d)
    val r = ev.agg(max(col("user_id")).cast("long"),
      max(col("event_id")).cast("long")).head()
    val (maxU, maxE) = (r.getLong(0) + 1, r.getLong(1) + 1)
    val events = ev.select(col("event_id"),
      expr(s"CAST(user_id AS BIGINT) * 1024 div $maxU").as("x"),
      expr(s"CAST(event_id AS BIGINT) * 1024 div $maxE").as("y"), col("value"))
    val nFiles = 16
    Layout.zorderWrite(events, col("x"), col("y"), 10, root.toString, nFiles)

    val back = spark.read.parquet(root.toString)
    assert(back.count() == events.count())
    // point-ish 2-d predicate: a 1/8 × 1/8 box of the domain
    val boxed = back.filter(col("x") < 128 && col("y") < 128)
    val touched = boxed.select(input_file_name()).distinct().count()
    val total = back.select(input_file_name()).distinct().count()
    assert(total >= nFiles / 2, s"expected ~$nFiles files, got $total")
    assert(touched <= total / 2,
      s"2-d box predicate touched $touched of $total z-ordered files — no locality")

    // per-file bounding boxes are small in BOTH dims (the z property;
    // a single-column sort would leave the other dim's span ~global)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    val avgSx = spans.map(_.getAs[Long]("sx")).sum.toDouble / spans.length
    val avgSy = spans.map(_.getAs[Long]("sy")).sum.toDouble / spans.length
    assert(avgSx < 1024 * 0.5, s"avg x-span $avgSx not bounded vs domain 1024")
    assert(avgSy < 1024 * 0.5, s"avg y-span $avgSy not bounded vs domain 1024")

    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
