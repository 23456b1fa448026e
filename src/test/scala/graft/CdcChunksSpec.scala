package graft

import org.apache.spark.sql.functions._
import graft.functions.CdcChunksExpr.cdcChunks

/** Content-defined chunking invariants: chunks are a partition of the
  * input (concatenation restores it exactly), boundaries replay the
  * documented md5-window predicate position by position, and the
  * re-alignment property that motivates CDC over fixed-size blocks —
  * a prefix insertion leaves the chunk set after the edit intact. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String, w: Int = 8): Seq[String] =
    Seq(s).toDF("t").select(cdcChunks(col("t"), w).as("c"))
      .head().getSeq[String](0)

  /** Reference cut set computed independently of the expression. */
  private def refCuts(s: String, w: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (w to s.length).filter { i =>
      md.reset()
      md.update(s.substring(i - w, i).getBytes("UTF-8"))
      (md.digest()(15) & 0x0f) == 0
    }
  }

  test("chunks concatenate back to the input and are all nonempty") {
    val texts = Seq(
      "key agg row scan slow fast table value part hash value table",
      "a" * 200,
      ('a' to 'z').mkString(" ") * 5)
    for (t <- texts) {
      val cs = chunksOf(t)
      assert(cs.mkString("") == t)
      assert(cs.forall(_.nonEmpty))
    }
  }

  test("cut positions match the md5-window predicate exactly") {
    val t = "key agg row scan slow fast table value part hash value " * 4
    val cuts = refCuts(t, 8)
    val expectedLens = {
      val bounds = (cuts :+ t.length).distinct.sorted
      bounds.zip(0 +: bounds).map { case (b, p) => b - p }
    }
    assert(chunksOf(t).map(_.length) == expectedLens)
  }

  test("degenerate inputs: empty -> no chunks, shorter than W -> one chunk") {
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf("short") == Seq("short"))
    assert(Seq((null: String)).toDF("t")
      .select(cdcChunks(col("t")).as("c")).head().isNullAt(0))
  }

  test("re-alignment: chunks after a prefix edit are preserved") {
    val base = "row scan slow fast table value part hash merge batch " * 10
    val edited = "INSERTED PREFIX " + base
    val a = chunksOf(base)
    val b = chunksOf(edited)
    // every chunk of the original except possibly the first few (where
    // the edit perturbs windows) reappears verbatim in the edited doc
    val tailA = a.drop(2).toSet
    val shared = b.count(tailA.contains)
    assert(shared >= a.size - 4,
      s"expected re-aligned chunks to survive: ${shared} of ${a.size}")
  }

  test("codepoint indexing: supplementary-plane chars count as one") {
    // U+1F600 is one codepoint but two UTF-16 units; chunk lengths and
    // reassembly must stay codepoint-consistent
    val t = "😀abcdefg " * 20
    val cs = chunksOf(t)
    assert(cs.mkString("") == t)
  }
}
