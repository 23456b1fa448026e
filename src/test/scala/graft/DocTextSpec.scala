package graft

import graft.functions.{GraftFunctions, Porter}
import graft.ingest.{AiExtract, DocParse}

class DocTextSpec extends SparkSpec {
  import spark.implicits._

  private val pdfText =
    """Nashville Music Festival
      |Venue: Riverfront Park
      |Date: October 12, 2025
      |https://nashfest.example.com
      |Great lineup this year
      |
      |name: Songwriter Night
      |address: 123 Broadway Ave
      |when: 11/02/2025
      |acoustic sets all evening""".stripMargin

  test("U4 state machine: labeled lines + heuristics -> records") {
    val recs = DocParse.parseText(pdfText)
    assert(recs.length == 2)
    val fest = recs.head
    assert(fest.name.contains("Nashville Music Festival"))
    assert(fest.venue_name.contains("Riverfront Park"))
    assert(fest.event_date.contains("October 12, 2025"))
    assert(fest.url.contains("https://nashfest.example.com"))
    assert(fest.description.contains("Great lineup this year"))
    val night = recs(1)
    assert(night.name.contains("Songwriter Night"))
    assert(night.venue_address.contains("123 Broadway Ave"))
    assert(night.event_date.contains("11/02/2025"))
  }

  test("U4 as DataFrame flatMap with synthetic urls") {
    val df = Seq((1L, pdfText), (2L, "short")).toDF("doc_id", "text")
    val got = DocParse.parse(df, "doc_id", "text")
    assert(got.count() == 2) // doc 2 has no name-like line
    val urls = got.select("url").as[String].collect()
    assert(urls.forall(u => u.startsWith("http") || u.startsWith("document://")))
  }

  test("U3 stub extractor: cap, gate and fallback error record") {
    val df = Seq(
      (1L, pdfText),
      (2L, "tiny"),                    // < 20 chars -> gated out (P8)
      (3L, "x " * 30))                 // long but nothing extractable
      .toDF("doc_id", "text")
    val got = AiExtract.extract(df, "doc_id", "text").collect()
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 2)
    assert(!byDoc.contains(2L))
    assert(byDoc(3L).head.getString(1) == "Extraction Failed")
  }

  test("Porter stemmer golden vocabulary") {
    val golden = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "sized" -> "size", "hopping" -> "hop", "falling" -> "fall",
      "happy" -> "happi", "sky" -> "sky", "relational" -> "relat",
      "conditional" -> "condit", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "formaliti" -> "formal", "triplicate" -> "triplic",
      "formative" -> "form", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good", "adjustable" -> "adjust",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "adhesion" -> "adhes", "activate" -> "activ",
      "effective" -> "effect", "controlling" -> "control")
    golden.foreach { case (in, want) =>
      assert(Porter.stem(in) == want, s"stem($in)")
    }
  }

  test("stem_tokens expression + SQL registration") {
    GraftFunctions.register(spark)
    val viaCol = Seq(Seq("running", "flies")).toDF("t")
      .select(Porter.stemTokens($"t")).as[Seq[String]].collect().head
    assert(viaCol == Seq("run", "fli"))
    val viaSql = spark.sql(
      "SELECT stem_tokens(array('running','flies')), " +
        "simhash64(array('a','b')), " +
        "minhash_sig(shingles(array('a','b','c','d'), 2), 4)")
      .collect().head
    assert(viaSql.getSeq[String](0) == Seq("run", "fli"))
    assert(viaSql.get(1).isInstanceOf[Long])
    assert(viaSql.getSeq[Long](2).length == 4)
  }

  test("GraftSession.local yields a session with engine functions ready") {
    // getOrCreate returns the suite's shared session and applies the
    // builder's modifiable confs to it — snapshot and restore so this
    // test can't leak a different shuffle parallelism into later suites
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = graft.GraftSession.local(before.toInt)
      val r = s.sql("SELECT size(shingles(array('a','b','c'), 2)), " +
        "cosine_sim(array(1.0D), array(2.0D)), " +
        "size(winnow(array('a','b','c','d'), 2, 2))").first()
      assert(r.getInt(0) == 2)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(r.getInt(2) >= 1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("ngrams + cosine_sim SQL registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT ngrams(array('a','b','a','b'), 2), " +
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), " +
        "cosine_sim(array(1.0D), array(1.0D, 2.0D))")
      .collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.isNullAt(2)) // length mismatch -> null
  }
}
