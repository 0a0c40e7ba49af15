package graft.functions

import scala.util.hashing.MurmurHash3

/** Pluggable embedding contract (SURVEY.md §1.4): 512-char input cap,
  * fixed-dim L2-normalized output, zero vector on empty input —
  * mirroring `embedding_service.py:98-130` (truncation `:118-121`,
  * normalize `:124`, zero-vector fallback `:114-115`).
  *
  * `HashEmbedder` is the deterministic test double (feature-hashed
  * bag-of-words): real deployments plug an ONNX/serving-backed
  * implementation behind the same trait, run via mapPartitions with
  * per-partition model reuse and batch size 32 (`:132-179`).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Double]
}

final class HashEmbedder(val dim: Int = 64, maxLen: Int = 512) extends Embedder {
  def embed(text: String): Array[Double] = {
    val v = new Array[Double](dim)
    if (text == null || text.isEmpty) return v
    val t = if (text.length > maxLen) text.substring(0, maxLen) else text
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val h = MurmurHash3.stringHash(tok, 42)
      val idx = math.floorMod(h, dim)
      val sign = if (((h >>> 16) & 1) == 0) 1.0 else -1.0
      v(idx) += sign
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    if (norm > 0) { var i = 0; while (i < dim) { v(i) /= norm; i += 1 } }
    v
  }
}
