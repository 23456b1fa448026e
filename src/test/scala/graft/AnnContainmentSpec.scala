package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** The banded-LSH ANN self-join is the registered sub-quadratic
  * embedding near-dup path (q74 — since r11 the md5-lattice
  * latticeAnnSelfJoin, oracle-exact; the float annSelfJoin stays the
  * nearDupPairs dispatch target); this spec pins recall for BOTH forms
  * against q40's exact pairs at sf0.01.
  *
  * Two claims, each made where the LSH math supports it:
  *  1. containment — at real near-dup similarity (cos ≥ 0.99, planted
  *     twins) the default (8 planes × 16 bands) scheme misses a pair
  *     with probability < 1e-20: every planted pair MUST be found;
  *  2. recall — this corpus's true pairs sit at cos 0.4–0.51 (no planted
  *     near-dups in embeddings), where a (6 × 32) banding has expected
  *     recall ≈ 0.87; observed 0.949 on this fixed, deterministic
  *     data — asserted with margin at 0.75. Since r8 the registered
  *     q74 derives planesPerBand from the corpus count (autoPlanes,
  *     density-flat at scale — measured ×10 exponent 0.78, was 1.24
  *     fixed); at this spec's 500-vector corpus the derivation lands
  *     on exactly 6, so the pinned banding below IS the registered
  *     one (asserted in the recall test).
  */
class AnnContainmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private def undirected(df: DataFrame): Set[(Long, Long)] =
    pairSet(df.select(least(col("a_id"), col("b_id")).as("a_id"),
      greatest(col("a_id"), col("b_id")).as("b_id")))

  test("HyperplaneSigsExpr is bit-identical to the declarative fold") {
    val e = Tables.t(spark, dir, "embeddings").limit(50)
    val fast = e.select(col("vec_id"), graft.functions.HashExprs
      .hyperplane_sigs(col("embedding"), 64, 6, 4).as("sigs"))
    val slow = e.select(col("vec_id"), array((0 until 4).map(b =>
      SimilarityOps.hyperplaneSig(col("embedding"), 64, 6,
        planeOffset = b * 6)): _*).as("sigs"))
    assert(fast.orderBy("vec_id").collect().toSeq ==
      slow.orderBy("vec_id").collect().toSeq)
  }

  test("planted near-duplicate twins are all found (containment)") {
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(200)
    // deterministic twin: same direction, one component nudged 1% —
    // cosine to the original ≈ 0.9999 (a genuine near-duplicate)
    val twins = e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val all = e.unionByName(twins)
    val found = undirected(
      SimilarityOps.annSelfJoin(all, "vec_id", "embedding", 64, k = 1000)
        .filter(col("cos_sim") >= 0.99))
    val expected = pairSet(e.select(col("vec_id").as("a_id"),
      (col("vec_id") + 1000000L).as("b_id")))
    val missed = expected -- found
    assert(expected.size == 200)
    assert(missed.isEmpty, s"LSH bands missed planted twins: $missed")
    // the registered lattice form (r11) at the same (8, 16) banding:
    // the miss-probability math is sign-family-independent, so every
    // planted twin must surface here too (score ≥ 0.98e8 ⇔ cos ≥ 0.99)
    val foundLat = undirected(
      SimilarityOps.latticeAnnSelfJoin(all, "vec_id", "embedding", 64,
          k = 1000, planesPerBand = 8, bands = 16)
        .filter(col("lat_cos_e8") >= 98000000L))
    val missedLat = expected -- foundLat
    assert(missedLat.isEmpty, s"lattice bands missed twins: $missedLat")
  }

  test("autoPlanes holds bucket density flat, floored and capped") {
    import SimilarityOps.autoPlanes
    // below floor·target the caller's tuning wins
    assert(autoPlanes(2000, 6) == 6)
    // density rule: 2^planes ≈ n/128 (the r6 probe's 10x corpus → 8)
    assert(autoPlanes(20000, 6) == 8)
    assert(autoPlanes(160000, 6) == 11)
    // recall-envelope cap: past 12 planes, scale bands instead
    assert(autoPlanes(100000000L, 6) == 12)
  }

  test("registered banding covers the exact pairs at the q74 threshold") {
    val e = Tables.t(spark, dir, "embeddings")
    // the registered q74 derives planes from the corpus count; at this
    // corpus the derivation must land on the pinned 6 so the recall
    // measured below is the registered query's recall
    assert(SimilarityOps.autoPlanes(e.count(), 6) == 6)
    val exact = undirected(
      SimilarityOps.exactCosinePairs(e, "vec_id", "embedding", 0.4))
    val ann = undirected(
      SimilarityOps.annSelfJoin(e, "vec_id", "embedding", 64, k = 1000,
          planesPerBand = 6, bands = 32)
        .filter(col("cos_sim") >= 0.4))
    assert(exact.nonEmpty)
    val recall = (exact & ann).size.toDouble / exact.size
    info(f"recall vs ${exact.size} exact pairs at 0.4: $recall%.3f")
    assert(recall >= 0.75, s"recall vs exact pairs at 0.4 was $recall")
    // the REGISTERED lattice form (r11): same banding on md5 signs;
    // its integer-score gate (sign·cos²·1e8 ≥ 0.16e8) expresses the
    // same cos ≥ 0.4 threshold on the quantized lattice, so recall vs
    // the float exact pairs carries the same margin
    val lat = undirected(
      SimilarityOps.latticeAnnSelfJoin(e, "vec_id", "embedding", 64,
          k = 1000, planesPerBand = 6, bands = 32)
        .filter(col("lat_cos_e8") >= 16000000L))
    val latRecall = (exact & lat).size.toDouble / exact.size
    info(f"lattice recall vs ${exact.size} exact pairs: $latRecall%.3f")
    assert(latRecall >= 0.75,
      s"lattice recall vs exact pairs at 0.4 was $latRecall")
  }

  test("LatticeSigsExpr is bit-identical to banded latticeSig calls") {
    val e = Tables.t(spark, dir, "embeddings").limit(50)
    val lat = e.select(col("vec_id"),
      SimilarityOps.latticeVec(col("embedding")).as("lv"))
    val fast = lat.select(col("vec_id"), graft.functions.HashExprs
      .lattice_sigs(col("lv"), 64, 6, 4).as("sigs"))
    // the declarative twin: latticeSig reads GLOBAL plane indices, so
    // band b's in-band plane j is plane b·6 + j — rebuild each band
    // signature from single-plane signs at those offsets
    import graft.functions.LongDotExpr.longDot
    val slow = lat.select(col("vec_id"), array((0 until 4).map { b =>
      (0 until 6).map { j =>
        val sgn = array((0 until 64).map(d =>
          lit(SimilarityOps.md5PlaneSign(b * 6 + j, d))): _*)
        when(longDot(col("lv"), sgn) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*).as("sigs"))
    assert(fast.orderBy("vec_id").collect().toSeq ==
      slow.orderBy("vec_id").collect().toSeq)
  }
}
