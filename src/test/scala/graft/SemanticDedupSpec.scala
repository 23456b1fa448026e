package graft

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** SimilarityOps.semanticDedup / semanticDedupAuto (r11 verdict #2 —
  * the k∝n production path must exist in code, not a comment):
  *   - dedup correctness on a corpus with a known duplicate group,
  *   - auto-k = ⌈n / targetClusterSize⌉ (report equals the explicit-k
  *     call),
  *   - THE SCALE PROPERTY: with k ∝ n, the per-cluster candidate count
  *     stays flat as the corpus grows — total intra-cluster pairs grow
  *     ~linearly in n, never quadratically.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** deterministic pseudo-random component in [-1, 1] (LCG-mixed). */
  private def comp(i: Long, d: Int): Float = {
    val z = (i * 1103515245L + d * 12345L + 54321L) * 0x9E3779B97F4A7C15L
    (((z >>> 20) % 1000001L).toFloat / 1000000.0f) * 2.0f - 1.0f
  }

  private def corpus(n: Int, dim: Int = 8) =
    (0L until n.toLong).map(i =>
      (i, Seq.tabulate(dim)(d => comp(i, d)))).toDF("vec_id", "embedding")

  test("duplicate group dedups to its min-id survivor; orthogonals stay") {
    // ±0.9·e_d for d < 8 (cos 0 or -1 between distinct vectors — never
    // an edge) plus two exact copies of id 0's vector (cos 1)
    def axis(d: Int, sgn: Float) =
      Seq.tabulate(8)(j => if (j == d) 0.9f * sgn else 0.0f)
    val rows = (0 until 8).map(d => (d.toLong, axis(d, 1.0f))) ++
      (0 until 8).map(d => (8L + d, axis(d, -1.0f))) ++
      Seq((16L, axis(0, 1.0f)), (17L, axis(0, 1.0f)))
    val report = SimilarityOps.semanticDedup(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4)
      .collect()
    assert(report.map(_.getLong(1)).sum == 18) // every vector accounted
    assert(report.map(_.getLong(3)).sum == 2) // exactly the two copies
    // survivor = min id ⇒ 16 and 17 removed, so the kept checksum is
    // Σ ids − 16 − 17 regardless of how Lloyd split the clusters
    assert(report.map(_.getLong(4)).sum == (0 until 18).sum - 16 - 17)
    // the duplicate group contributes its 3 intra-group edges
    assert(report.map(_.getLong(2)).sum == 3)
  }

  test("semanticDedupAuto picks k = ceil(n / target)") {
    val df = corpus(240)
    val auto = SimilarityOps.semanticDedupAuto(
      df, "vec_id", "embedding", targetClusterSize = 60)
    val explicit = SimilarityOps.semanticDedup(
      df, "vec_id", "embedding", k = 4) // ceil(240/60)
    assert(auto.collect().toSeq == explicit.collect().toSeq)
  }

  test("k ∝ n holds per-cluster candidate count flat across corpus sizes") {
    def totalPairs(n: Int): (Long, Long) = {
      val rep = SimilarityOps.semanticDedupAuto(
        corpus(n), "vec_id", "embedding", targetClusterSize = 60)
        .collect()
      val sizes = rep.map(_.getLong(1))
      assert(sizes.sum == n)
      (sizes.map(s => s * (s - 1) / 2).sum, sizes.max)
    }
    val (pairs1, max1) = totalPairs(240)
    val (pairs4, max4) = totalPairs(960) // 4× the corpus, 4× the k
    // flat cluster sizes ⇒ pairs grow ~linearly (×4); a pinned k would
    // grow them quadratically (×16). Allow skew slack up to ×8.
    assert(pairs4 <= 8 * math.max(pairs1, 1L),
      s"pair candidates grew superlinearly: $pairs1 -> $pairs4")
    // and no cluster balloons to a constant fraction of the corpus
    assert(max4 <= 8 * 60, s"largest cluster $max4 at n=960")
  }
}
