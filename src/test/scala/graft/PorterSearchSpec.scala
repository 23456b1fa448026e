package graft

import org.apache.spark.sql.functions._
import graft.functions.Porter

/** Pins the literal-map oracle stance of q76_stemmed_search: the corpus
  * vocabulary is closed, and the ONLY vocab tokens whose Porter stems
  * equal the stems of the query terms ("querying" → queri, "merges" →
  * merg) are 'query' and 'merge'. If the corpus generator ever adds an
  * inflected form (e.g. "queries"), this spec fails before the oracle
  * gate silently diverges. */
class PorterSearchSpec extends SparkSpec {

  test("query terms stem to the expected keys") {
    assert(Porter.stem("querying") == "queri")
    assert(Porter.stem("query") == "queri")
    assert(Porter.stem("merges") == "merg")
    assert(Porter.stem("merge") == "merg")
  }

  test("cleanText: NFC composes, controls vanish, whitespace collapses") {
    import spark.implicits._
    import graft.ops.TextOps
    val got = Seq(
      "cafe\u0301 \u200B x",   // decomposed e+acute + zero-width space
      "caf\u00e9 x",            // already NFC - must be identical
      "  ab\u0007\tc\nd  ",   // control stripped, tab/newline are ws
      "")
      .toDF("t")
      .select(TextOps.cleanText($"t")).as[String].collect().toSeq
    assert(got == Seq("caf\u00e9 x", "caf\u00e9 x", "ab c d", ""))
    // idempotent: cleaning clean text is the identity
    val twice = Seq("cafe\u0301 x").toDF("t")
      .select(TextOps.cleanText(TextOps.cleanText($"t")))
      .as[String].collect().head
    assert(twice == "caf\u00e9 x")
  }

  test("corpus vocabulary preimages of the query stems are exact") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vocab = Tables.t(spark, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .distinct()
        .collect()
        .map(_.getString(0))
        .toSet
      val toQueri = vocab.filter(Porter.stem(_) == "queri")
      val toMerg = vocab.filter(Porter.stem(_) == "merg")
      assert(toQueri == Set("query"), s"$dir: preimage of queri = $toQueri")
      assert(toMerg == Set("merge"), s"$dir: preimage of merg = $toMerg")
    }
  }
}
