package graft

import org.apache.spark.sql.functions._

/** Round-8 additions q255-q264: every check recomputes the result from
  * raw rows in plain Scala (column extraction only on the Spark side),
  * so a query bug and a test bug can't cancel out. */
class Round8QSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def epoch(iso: String): Long =
    java.time.Instant.parse(iso + "T00:00:00Z").getEpochSecond

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("q255 forecast revenue equals brute filtered decimal sum") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select($"l_shipdate".cast("long"), $"l_discount", $"l_quantity",
        $"l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val hit = rows.filter { case (sd, disc, qty, _) =>
      sd >= epoch("1996-01-01") && sd < epoch("1997-01-01") &&
        disc >= 0.05 && disc <= 0.07 && qty < 24
    }
    val expRev = hit.map { case (_, d, _, p) =>
      BigDecimal(p * d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val Array(row) = run("q255_forecast_revenue").collect()
    assert(row.getDouble(0) === expRev.toDouble)
    assert(row.getLong(1) === hit.length.toLong)
  }

  private lazy val embs: Seq[(Long, Int, Array[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).toArray)).toSeq

  test("q258 int8 quantization error equals brute lattice arithmetic") {
    val exp = embs.flatMap { case (_, label, v) =>
      v.map { x =>
        val l = math.floor(x.toDouble * 1000000).toLong
        val q = math.floor(x.toDouble * 127).toLong
        (label.toLong, math.abs(127 * l - 1000000 * q))
      }
    }.groupBy(_._1).map { case (lab, es) =>
      lab -> (es.length.toLong, es.map(_._2).sum, es.map(_._2).max)
    }
    val got = run("q258_int8_quant_error").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, s, m) = exp(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == m,
        s"label ${r.getLong(0)}")
      assert(r.getLong(4) == s / n)
    }
  }

  test("q259 matryoshka energy retention equals brute lattice sums") {
    val exp = embs.groupBy(_._2).map { case (lab, vs) =>
      var e16 = 0L; var e64 = 0L
      vs.foreach { case (_, _, v) =>
        v.zipWithIndex.foreach { case (x, i) =>
          val q = math.floor(x.toDouble * 1000).toLong
          e64 += q * q
          if (i < 16) e16 += q * q
        }
      }
      lab.toLong -> (e16, e64)
    }
    val got = run("q259_matryoshka_energy").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (e16, e64) = exp(r.getLong(0))
      assert(r.getLong(1) == e16 && r.getLong(2) == e64, s"label ${r.getLong(0)}")
      assert(r.getLong(3) == e16 * 10000 / e64)
      assert(r.getLong(3) <= 10000)
    }
  }

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q260 blocklist hits equal brute token counting") {
    val block = Set("slow", "hash", "scan", "merge")
    val exp = docs.groupBy(_._3).map { case (src, ds) =>
      val hits = ds.map(_._2.toLowerCase.split(" ", -1).count(block))
      src -> (ds.length.toLong, hits.count(_ > 0).toLong,
        hits.map(_.toLong).sum)
    }
    val got = run("q260_blocklist_hits").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, f, h) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == f && r.getLong(3) == h,
        s"source ${r.getString(0)}")
      assert(r.getLong(4) == f * 10000 / n)
    }
    assert(exp.values.exists(_._2 > 0), "blocklist must actually hit")
  }

  test("q261 chat gate classifies every injected malformation") {
    val exp = docs.groupBy { case (id, _, _) =>
      (id % 4) match {
        case 2 => "missing_role"
        case 3 => "empty_content"
        case 1 => "bad_alternation"
        case _ => "ok"
      }
    }.map { case (v, ds) => v -> (ds.length.toLong, ds.map(_._1).sum) }
    val got = run("q261_chat_schema_gate").collect()
    assert(got.length == 4, "all four classes must appear")
    got.foreach { r =>
      val (n, ck) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == ck, r.getString(0))
    }
  }

  test("q262 alpha equals brute Krippendorff over md5 ratings") {
    val rated = docs.map { case (id, _, _) =>
      val a1 = ("0123456789abcdef".indexOf(md5hex(s"r1:$id").charAt(0))) % 5
      val b = ("0123456789abcdef".indexOf(md5hex(s"r2:$id").charAt(0))) % 3
      val a2 = if (id % 3 == 0) (a1 + 1 + b) % 5 else a1
      (a1.toLong, a2.toLong)
    }
    val n = rated.length.toLong
    val doNum = 2 * rated.map { case (x, y) => (x - y) * (x - y) }.sum
    val hist = (rated.map(_._1) ++ rated.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ks = hist.keys.toSeq
    val deNum = (for (c <- ks; k <- ks)
      yield hist(c) * hist(k) * (c - k) * (c - k)).sum
    val alphaBp = 10000 -
      (BigInt(doNum) * (2 * n - 1) * 10000 / BigInt(deNum)).toLong
    val Array(row) = run("q262_krippendorff_alpha").collect()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == doNum)
    assert(row.getLong(2) == deNum)
    assert(row.getLong(3) == alphaBp)
    assert(doNum > 0, "injected disagreement must be present")
  }

  test("q263 politeness budget equals brute host truth") {
    val exp = docs.map { case (id, _, _) =>
      val k = id % 5
      (id % 4) match {
        case 0 => s"www.example$k.com"
        case 1 => s"site$k.org"
        case 2 => s"example$k.com"
        case _ => s"cdn.example$k.com"
      }
    }.groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val total = exp.values.sum
    val got = run("q263_host_politeness").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val n = exp(r.getString(0))
      assert(r.getLong(1) == n, r.getString(0))
      assert(r.getLong(2) == 2 * n)
      assert(r.getLong(3) == (n + 9) / 10)
      assert(r.getLong(4) == n * 10000 / total)
    }
  }

  test("q265 decayed popularity equals brute integer halving") {
    val evs = Tables.t(spark, sf, "events")
      .select($"event_type", $"ts".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ref = evs.map(_._2).max
    val exp = evs.groupBy(_._1).map { case (et, es) =>
      val ages = es.map(e => (ref - e._2) / 604800)
      et -> (es.length.toLong,
        ages.map(a => 1024L >> math.min(a, 10L).toInt).sum, ages.max)
    }
    val got = run("q265_decayed_popularity").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, sc, ma) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == sc && r.getLong(3) == ma,
        r.getString(0))
    }
    // decay actually bites: not every event at full weight
    assert(exp.values.exists { case (n, sc, _) => sc < 1024 * n })
  }

  test("q268 Spearman equals brute ranked correlation") {
    val metas = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val stop = Set("the", "a", "an", "of", "to", "and", "in", "is",
      "on", "for")
    def qbp(text: String): Long = {
      val tk = text.toLowerCase.split(" ", -1)
      val n = tk.length.toLong
      val content = n - tk.count(stop)
      if (n <= 100) content * 100 else content * 10000 / n
    }
    val rx = metas.sortBy(m => (m._2, m._1)).zipWithIndex
      .map { case (m, i) => m._1 -> (i + 1L) }.toMap
    val ry = metas.map(m => (m._1, qbp(m._3)))
      .sortBy { case (id, q) => (q, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val n = metas.length.toLong
    val sumD2 = metas.map(m => {
      val d = rx(m._1) - ry(m._1); d * d
    }).sum
    val rho = 10000 -
      (BigInt(6) * sumD2 * 10000 / (BigInt(n) * (n * n - 1))).toLong
    val Array(row) = run("q268_length_quality_spearman").collect()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == sumD2)
    assert(row.getLong(2) == rho)
  }

  test("q269 bloom audit equals brute bit-set replay") {
    def md5bucket(j: Int, w: String): Long = {
      val h = md5hex(s"$j:$w")
      def nib(p: Int) = "0123456789abcdef".indexOf(h.charAt(p)).toLong
      nib(0) * 4096 + nib(1) * 256 + nib(2) * 16 + nib(3)
    }
    val shingles = docs.flatMap { case (_, text, _) =>
      val tk = text.toLowerCase.split(" ", -1)
      (0 until math.max(0, tk.length - 2))
        .map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}")
    }.toSet
    val bits = (for (w <- shingles; j <- 0 until 3)
      yield md5bucket(j, w)).toSet
    val fps = shingles.map(_ + "#p")
      .count(p => (0 until 3).forall(j => bits(md5bucket(j, p))))
    val Array(row) = run("q269_bloom_fpr").collect()
    assert(row.getLong(0) == shingles.size.toLong)
    assert(row.getLong(1) == shingles.size.toLong)
    assert(row.getLong(2) == bits.size.toLong)
    assert(row.getLong(3) == fps.toLong)
    assert(row.getLong(4) == fps.toLong * 10000 / shingles.size)
    val b = BigInt(bits.size)
    assert(row.getLong(5) == (b * b * b * 10000 /
      (BigInt(65536) * 65536 * 65536)).toLong)
  }

  test("q270 funnel gates are cumulative and match brute counts") {
    val metasL = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"source", $"lang", $"n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val stop = Set("the", "a", "an", "of", "to", "and", "in", "is",
      "on", "for")
    val block = Set("slow", "hash", "scan", "merge")
    def qbp(text: String): Long = {
      val tk = text.toLowerCase.split(" ", -1)
      val n = tk.length.toLong
      val content = n - tk.count(stop)
      if (n <= 100) content * 100 else content * 10000 / n
    }
    val exp = metasL.groupBy(_._3).map { case (src, ds) =>
      val g1 = ds.filter(_._5 >= 150)
      val g2 = g1.filter(_._4 != "zh")
      val g3 = g2.filter(d => qbp(d._2) >= 5000)
      val g4 = g3.filter(
        _._2.toLowerCase.split(" ", -1).count(block) <= 4)
      src -> (ds.length.toLong, g1.length.toLong, g2.length.toLong,
        g3.length.toLong, g4.length.toLong)
    }
    val got = run("q270_curation_funnel").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, a, b, c, d) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == a && r.getLong(3) == b
        && r.getLong(4) == c && r.getLong(5) == d, r.getString(0))
      // monotone funnel
      assert(n >= a && a >= b && b >= c && c >= d)
    }
  }

  test("q272 path signatures equal brute per-user ordered journeys") {
    val evs = Tables.t(spark, sf, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perUser = evs.groupBy(_._1).map { case (u, es) =>
      val path = es.sortBy(e => (e._2, e._3)).map(_._4).mkString(">")
      (u, md5hex(path), es.length.toLong)
    }
    val exp = perUser.groupBy(_._2).map { case (sig, us) =>
      sig -> (us.size.toLong, us.map(_._3).min, us.map(_._1).min)
    }
    val got = run("q272_path_signatures").collect()
    assert(got.length == math.min(25, exp.size))
    got.foreach { r =>
      val (n, len, mu) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == len &&
        r.getLong(3) == mu, r.getString(0))
    }
    // deterministic top-25: everything excluded has n_users <= min kept
    val minKept = got.map(_.getLong(1)).min
    val kept = got.map(_.getString(0)).toSet
    assert(exp.filterNot(e => kept(e._1)).forall(_._2._1 <= minKept))
  }

  test("q273 collocation lift equals brute bigram counting") {
    val tks = docs.map(_._2.toLowerCase.split(" ", -1)).filter(_.length >= 2)
    val bigrams = tks.flatMap(tk =>
      (0 until tk.length - 1).map(i => s"${tk(i)} ${tk(i + 1)}"))
    val cab = bigrams.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val uni = tks.flatten.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val nUni = uni.values.sum
    val nBig = bigrams.length.toLong
    val exp = cab.filter(_._2 >= 20).map { case (bg, c) =>
      val Array(a, b) = bg.split(" ")
      bg -> (c, uni(a), uni(b),
        (BigInt(c) * nUni * nUni * 1000000 /
          (BigInt(nBig) * uni(a) * uni(b))).toLong)
    }
    val got = run("q273_collocations").collect()
    assert(got.length == math.min(20, exp.size))
    got.foreach { r =>
      val (c, ca, cb, l) = exp(r.getString(0))
      assert(r.getLong(1) == c && r.getLong(2) == ca &&
        r.getLong(3) == cb && r.getLong(4) == l, r.getString(0))
    }
    // top-20 really are the highest lifts
    val minKept = got.map(_.getLong(4)).min
    val kept = got.map(_.getString(0)).toSet
    assert(exp.filterNot(e => kept(e._1)).forall(_._2._4 <= minKept))
    // lift actually separates: some collocation above independence
    assert(got.head.getLong(4) > 1000000)
  }

  test("q274 join cardinality audit equals brute histogram math") {
    val evs = Tables.t(spark, sf, "events")
      .select($"user_id").collect().map(_.getLong(0))
    val h = evs.groupBy(identity).map(_._2.length.toLong)
    val n = evs.length.toLong
    val ndv = h.size.toLong
    val actual = h.map(c => c * c).sum
    val est = n * n / ndv
    val Array(row) = run("q274_join_cardinality").collect()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == ndv)
    assert(row.getLong(2) == actual)
    assert(row.getLong(3) == est)
    assert(row.getLong(4) == (BigInt(actual) * 10000 / est).toLong)
  }

  test("q275 inter-quantile mean equals brute order statistics") {
    val evs = Tables.t(spark, sf, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val exp = evs.groupBy(_._1).map { case (et, es) =>
      val sorted = es.map(_._2).sorted
      val n = sorted.length.toLong
      def kth(num: Long, den: Long): Long =
        sorted(((n * num + den - 1) / den - 1).toInt)
      val (p10, p90) = (kth(1, 10), kth(9, 10))
      val kept = sorted.filter(c => c >= p10 && c <= p90)
      et -> (n, kept.length.toLong, p10, p90,
        kept.sum * 10000 / kept.length)
    }
    val got = run("q275_interquantile_mean").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, k, p10, p90, m) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k &&
        r.getLong(3) == p10 && r.getLong(4) == p90 &&
        r.getLong(5) == m, r.getString(0))
      assert(k < n, "trim must drop something")
    }
  }

  test("q277 cohort LTV equals brute week-offset accumulation") {
    val evs = Tables.t(spark, sf, "events")
      .select($"user_id", $"ts".cast("date").cast("string"), $"value")
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        (BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val cohort = evs.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).min
    }
    val weekly = evs.groupBy { case (u, d, _) =>
      (cohort(u), java.time.temporal.ChronoUnit.DAYS
        .between(cohort(u), d) / 7)
    }.map { case ((cd, w), es) =>
      (cd.toString, w) -> (es.map(_._1).distinct.length.toLong,
        es.map(_._3).sum)
    }
    val got = run("q277_cohort_ltv").collect()
    assert(got.length == weekly.size)
    val cum = scala.collection.mutable.Map[String, Long]()
    got.sortBy(r => (r.getString(0), r.getLong(1))).foreach { r =>
      val (nu, rev) = weekly((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == nu && r.getLong(3) == rev,
        s"${r.getString(0)} w${r.getLong(1)}")
      val c = cum.getOrElse(r.getString(0), 0L) + rev
      cum(r.getString(0)) = c
      assert(r.getLong(4) == c)
    }
  }

  test("q278 LSH recall audit equals brute signature replay") {
    val shs = docs.map { case (id, text, _) =>
      val tk = text.toLowerCase.split(" ", -1)
      id -> (0 until math.max(0, tk.length - 2))
        .map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
    }.filter(_._2.nonEmpty)
    val exact = (for {
      (a, sa) <- shs; (b, sb) <- shs if a < b
      inter = (sa & sb).size
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      if j >= BigDecimal("0.5")
    } yield (a, b)).toSet
    val keys = shs.map { case (id, ss) =>
      val sigs = (0 until 8).map(r => ss.map(sh => md5hex(s"$r:$sh")).min)
      id -> (sigs.take(4).mkString, sigs.drop(4).mkString)
    }.toMap
    val cand = (for {
      a <- keys.keys; b <- keys.keys if a < b
      if keys(a)._1 == keys(b)._1 || keys(a)._2 == keys(b)._2
    } yield (a, b)).toSet
    val hit = (cand & exact).size.toLong
    val Array(row) = run("q278_lsh_recall").collect()
    assert(row.getLong(0) == exact.size.toLong)
    assert(row.getLong(1) == cand.size.toLong)
    assert(row.getLong(2) == hit)
    assert(exact.nonEmpty, "true pair set must be non-empty")
    if (exact.nonEmpty)
      assert(row.getLong(3) == hit * 10000 / exact.size)
    if (cand.nonEmpty)
      assert(row.getLong(4) == hit * 10000 / cand.size)
  }

  test("q279 RFM segments equal brute quintile scoring") {
    val evs = Tables.t(spark, sf, "events")
      .select($"user_id", $"ts".cast("long"), $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val ref = evs.map(_._2).max
    val users = evs.groupBy(_._1).map { case (u, es) =>
      (u, (ref - es.map(_._2).max) / 86400, es.length.toLong,
        es.map(_._3).sum)
    }.toSeq
    val n = users.length.toLong
    def fences(vals: Seq[Long]): Seq[Long] = {
      val sorted = vals.sorted
      (1 to 4).map(q => sorted(((n * q + 4) / 5 - 1).toInt))
    }
    val (fr, ff, fm) = (fences(users.map(_._2)), fences(users.map(_._3)),
      fences(users.map(_._4)))
    def sc(v: Long, f: Seq[Long]): Long = 1 + f.count(v > _)
    val exp = users.map { case (u, r, fq, m) =>
      (u, 6 - sc(r, fr), sc(fq, ff), sc(m, fm))
    }.groupBy(t => (t._2, t._3, t._4)).map { case (k, us) =>
      k -> (us.length.toLong, us.map(_._1).min)
    }
    val got = run("q279_rfm_segments").collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (nu, mu) = exp((r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(r.getLong(3) == nu && r.getLong(4) == mu,
        s"${r.getLong(0)}/${r.getLong(1)}/${r.getLong(2)}")
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 5)
    }
    // quintile scoring must actually spread users across scores
    assert(exp.size > 5)
  }

  test("q280 Benford audit equals brute digit counting") {
    val benford = Map(1L -> 3010L, 2L -> 1761L, 3L -> 1249L, 4L -> 969L,
      5L -> 792L, 6L -> 669L, 7L -> 580L, 8L -> 512L, 9L -> 458L)
    assert(benford.values.sum == 10000L)
    val digits = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_totalprice").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      .filter(_ > 0)
      .map(_.toString.head.asDigit.toLong)
    val counts = digits.groupBy(identity).map { case (d, v) =>
      d -> v.length.toLong }
    val total = digits.length.toLong
    val got = run("q280_benford_audit").collect()
    assert(got.length == counts.size)
    got.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == counts(d), s"digit $d")
      assert(r.getLong(2) == counts(d) * 10000 / total)
      assert(r.getLong(3) == benford(d))
      assert(r.getLong(4) ==
        math.abs(counts(d) * 10000 / total - benford(d)))
    }
    // the audit discriminates: synthetic totals are NOT Benford
    assert(got.map(_.getLong(4)).max > 100)
  }

  test("q264 accent fold roundtrips and counts injected code points") {
    val accent = Map('a' -> 'á', 'e' -> 'é', 'i' -> 'í', 'o' -> 'ó',
      'u' -> 'ú')
    val got = run("q264_accent_fold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq
    assert(got.length == docs.length)
    val byId = docs.map(d => d._1 -> d._2).toMap
    got.foreach { case (id, nAcc, accMd5, foldMd5, ok) =>
      val text = byId(id)
      val accented = text.map(c => accent.getOrElse(c, c))
      assert(nAcc == text.count(accent.contains), s"doc $id")
      assert(accMd5 == md5hex(accented), s"doc $id")
      assert(foldMd5 == md5hex(text), s"doc $id")
      assert(ok, s"doc $id roundtrip")
    }
    assert(got.exists(_._2 > 0), "accents must actually be injected")
  }
}
