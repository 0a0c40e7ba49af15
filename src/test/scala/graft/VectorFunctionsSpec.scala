package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.HashEmbedder

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  test("dot: exact left-to-right double accumulation, float widened") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(dot(col("a"), col("b"))).head().getDouble(0)
    assert(r == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
  }

  test("dot: null input yields null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("dot: works under whole-stage codegen over many rows") {
    val n = 1000
    val df = spark.range(n).select(
      transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(0), lit(7)), i => lit(1.0)).as("b"))
    val total = df.select(sum(dot(col("a"), col("b")))).head().getDouble(0)
    // sum over id of sum_{i<8}(id+i) = 8*id + 28
    val expected = (0 until n).map(id => 8.0 * id + 28.0).sum
    assert(total == expected)
  }

  test("signSketch: words match a driver fold and the per-plane codeCol form, codegen on") {
    import graft.functions.RpLsh
    val rp = new RpLsh(128, 16, PlaneBase = 8)
    val planes = rp.planes.map(_.toArray).toArray
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j + 1.0)))
    }
    val got = vecs.toDF("id", "emb")
      .select(col("id"), signSketch(col("emb"), planes).as("w"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, e) =>
      val exp = new Array[Long](2)
      planes.zipWithIndex.foreach { case (pl, p) =>
        var acc = 0.0; var j = 0
        while (j < 16) { acc += e(j) * pl(j); j += 1 }
        if (acc >= 0.0) exp(p / 64) |= (1L << (p % 64))
      }
      assert(got(id) == exp.toSeq, s"sketch mismatch for id $id")
    }
    // word0 must equal the 64-plane codeCol of the same plane window
    // (the layout dd_semdedup_sketch relied on before the expression)
    val sk0 = new RpLsh(64, 16, PlaneBase = 8)
    val viaCode = vecs.toDF("id", "emb")
      .select(col("id"), sk0.codeCol(col("emb")).as("c"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, _) => assert(got(id).head == viaCode(id)) }
  }

  test("cosine: normalized, orthogonal, zero-vector guard") {
    val df = Seq(
      (Array(3.0, 4.0), Array(3.0, 4.0)),   // parallel → 1
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal → 0
      (Array(0.0, 0.0), Array(1.0, 1.0))    // zero norm → 0
    ).toDF("a", "b")
    val r = df.select(cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12 && r(1) == 0.0 && r(2) == 0.0)
  }

  test("l2normalize: unit norm, zero stays zero") {
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("a", "z")
    val row = df.select(l2normalize(col("a")), l2normalize(col("z"))).head()
    val a = row.getSeq[Double](0)
    assert(math.abs(a(0) - 0.6) < 1e-12 && math.abs(a(1) - 0.8) < 1e-12)
    assert(row.getSeq[Double](1).forall(_ == 0.0))
  }

  test("HashEmbedder: deterministic, normalized, zero on empty, 512-char cap") {
    val e = new HashEmbedder(64)
    val v1 = e.embed("spark joins and shuffles")
    val v2 = e.embed("spark joins and shuffles")
    assert(v1.sameElements(v2))
    assert(math.abs(math.sqrt(v1.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(e.embed("").forall(_ == 0.0))
    val base = "word " * 110 // > 512 chars
    assert(e.embed(base).sameElements(e.embed(base + "extra-tail-ignored")))
  }
}
