package graft

/** Round-7 additions q225-q233: every check recomputes the result from
  * raw rows in plain Scala (no Spark ops, no codecs on the brute path),
  * so a query bug and a test bug can't cancel out. The media queries'
  * brute twins recompute from the TEXT formulas — agreement with the
  * query output proves the real encode→decode roundtrip is lossless on
  * top of the math being right. */
class MetricsQSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._1)

  private val stop = Set("the", "a", "an", "of", "to", "and", "in",
    "is", "on", "for")

  /** Spark's split(lower(text), " ") keeps trailing empties → limit -1. */
  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ", -1)

  private def qualityBp(text: String): Long = {
    val tk = toks(text)
    val n = tk.length.toLong
    val content = n - tk.count(stop)
    if (n <= 100) content * 100 else content * 10000 / n
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q225 AUC equals brute-force pair counting") {
    val scored = docs.map { case (_, text, lang) =>
      (qualityBp(text), lang == "en")
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var u2 = 0L
    for (p <- pos; g <- neg) {
      if (p > g) u2 += 2 else if (p == g) u2 += 1
    }
    val expAuc = u2 * 5000 / (pos.length.toLong * neg.length)
    val Array(row) = run("q225_quality_auc").collect()
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === expAuc)
  }

  test("q226 Count-Min never underestimates and exact counts are exact") {
    val counts = docs.flatMap(d => toks(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = run("q226_countmin_sketch").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (tk, exact, est, over) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(exact === counts(tk), s"exact count drift for '$tk'")
      assert(est >= exact, s"CMS underestimated '$tk': $est < $exact")
      assert(over === (est - exact) * 10000 / exact)
    }
    // top-20 selection really is the 20 largest with the (n desc, tk) tiebreak
    val expTop = counts.toSeq.sortBy { case (tk, n) => (-n, tk) }.take(20)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      expTop.sortBy { case (tk, n) => (-n, tk) })
  }

  test("q227 MinHash signatures, candidates and estimates replay exactly") {
    val sigs = docs.flatMap { case (id, text, _) =>
      val tk = toks(text)
      val shingles = (0 to tk.length - 3)
        .map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").distinct
      if (shingles.isEmpty) None
      else Some(id -> (0 until 8).map(r =>
        shingles.map(sh => md5hex(s"$r:$sh")).min))
    }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && sa.head == sb.head
    } yield {
      val agree = (0 until 8).count(r => sa(r) == sb(r)).toLong
      (a, b, agree, agree * 10000 / 8)
    }).sortBy(t => (t._1, t._2))
    val got = run("q227_minhash_estimate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q228 serpentine shards are count-balanced and exactly reproducible") {
    val ranked = docs.map { case (id, text, _) => (id, qualityBp(text)) }
      .sortBy { case (id, bp) => (-bp, id % 32, id) }
    val assigned = ranked.zipWithIndex.map { case ((_, bp), r0) =>
      val pass = r0 / 8
      val pos = r0 % 8
      (if (pass % 2 == 0) pos.toLong else 7L - pos, bp)
    }
    val expected = assigned.groupBy(_._1).toSeq.map { case (sh, rows) =>
      (sh, rows.size.toLong, rows.map(_._2).sum / rows.size)
    }.sortBy(_._1)
    val got = run("q228_curriculum_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    val ns = got.map(_._2)
    assert(ns.max - ns.min <= 1, s"serpentine shard counts unbalanced: $ns")
  }

  test("q229 k-fold strata replay the md5-nibble assignment") {
    val hex = "0123456789abcdef"
    val folds = docs.map { case (id, _, lang) =>
      val h = md5hex(s"fold:$id")
      val f = (hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))) % 5
      (lang, f.toLong)
    }
    val byLang = folds.groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    val expected = folds.groupBy(identity).toSeq
      .map { case ((l, f), v) =>
        val n = v.size.toLong
        (l, f, n, n * 10000 / byLang(l))
      }.sortBy(t => (t._1, t._2))
    val got = run("q229_kfold_strata").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    got.foreach { case (_, f, _, _) => assert(f >= 0 && f <= 4) }
  }

  test("q230 covariance top-10 equals brute-force moments") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v =>
        math.floor(v.toDouble * 1000).toLong).toArray)
    val n = BigInt(vecs.length)
    val d = 64
    val si = (0 until d).map(i => BigInt(vecs.map(_(i)).sum))
    val expected = (for {
      i <- 0 until d; j <- i + 1 until d
    } yield {
      val sp = vecs.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      (i + 1L, j + 1L, n * sp - si(i) * si(j))
    }).sortBy { case (i, j, c) => (-c.abs, i, j) }.take(10)
    val got = run("q230_embedding_covariance").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigInt(r.getString(2)))).toSeq
    assert(got === expected)
  }

  test("q254 per-region Gini equals brute-force sorted-rank formula") {
    val sf001 = sf
    def num(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (num(r, 0),
        // mirror the query's double → DECIMAL(20,2) cast (HALF_UP)
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(100)).toLongExact))
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (num(r, 0), num(r, 1))).toMap
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (num(r, 0), num(r, 1))).toMap
    val region = spark.read.parquet(s"$sf001/region.parquet")
      .select("r_regionkey", "r_name").collect()
      .map(r => (num(r, 0), r.getString(1))).toMap
    val perCust = orders.groupBy(_._1).map { case (ck, os) =>
      (region(nation(cust(ck))), ck, os.map(_._2).sum)
    }
    val expected = perCust.groupBy(_._1).toSeq.map { case (rn, v) =>
      val sorted = v.toSeq.sortBy(t => (t._3, t._2))
      val n = BigInt(sorted.size)
      val sx = sorted.map(t => BigInt(t._3)).sum
      val six = sorted.zipWithIndex
        .map { case (t, i) => BigInt(i + 1) * t._3 }.sum
      (rn, sorted.size.toLong,
        ((BigInt(2) * six - (n + 1) * sx) * 10000 / (n * sx)).toLong)
    }.sortBy(_._1)
    val got = run("q254_region_gini").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // Gini lives in [0, 1): bp bounds as a sanity rail
    got.foreach { case (_, _, g) => assert(g >= 0 && g < 10000) }
  }

  test("q253 exact SimHash bits recompute from md5 nibbles") {
    val hex = "0123456789abcdef"
    val expected0 = docs.map { case (id, text, _) =>
      val counts = toks(text).groupBy(identity)
        .map { case (tk, v) => tk -> v.size.toLong }
      var fp = 0L
      for (k <- 0 until 16) {
        val vote = counts.map { case (tk, c) =>
          val nibv = hex.indexOf(md5hex(tk)(k / 4))
          if ((nibv & (1 << (k % 4))) > 0) c else -c
        }.sum
        if (vote > 0) fp |= (1L << k)
      }
      (id, fp)
    }
    val groupN = expected0.groupBy(_._2).map { case (f, v) => f -> v.size.toLong }
    val expected = expected0.map { case (id, fp) => (id, fp, groupN(fp)) }
      .sortBy(_._1)
    val got = run("q253_simhash_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q251 best-quality survivor equals brute-force cluster argmax") {
    // reuse q248's brute edge builder: same threshold, same shingles
    def shingles(text: String): Set[String] = {
      val tk = toks(text)
      (0 to tk.length - 3).map(i =>
        s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
    }
    val sh = docs.map(d => (d._1, shingles(d._2)))
    val edges = for {
      (a, sa) <- sh; (b, sb) <- sh
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      un = sa.size + sb.size - inter
      if BigDecimal(inter.toDouble / un)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.5")
    } yield (a, b)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(v: Long): Long =
      if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val qOf = docs.map(d => d._1 -> qualityBp(d._2)).toMap
    val expected = nodes.groupBy(v => nodes.filter(w => find(w) == find(v)).min)
      .toSeq.map { case (cluster, members) =>
        val keep = members.minBy(m => (-qOf(m), m))
        (cluster, members.size.toLong, keep, qOf(keep))
      }.sortBy(_._1)
    val got = run("q251_dedup_best_quality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q252 consistent-hash ring replays and bounds churn to one arc") {
    val ring = for (sh <- 0L until 4L; v <- 0 until 8)
      yield (sh, md5hex(s"$sh:$v"))
    def owner(pos: String, pts: Seq[(Long, String)]): Long = {
      val ge = pts.filter(_._2 >= pos)
      val pick = if (ge.nonEmpty) ge else pts
      pick.minBy(p => (p._2, p._1))._1
    }
    val assigns = docs.map { case (id, _, _) =>
      val pos = md5hex(s"doc:$id")
      (owner(pos, ring), owner(pos, ring.filterNot(_._1 == 3L)))
    }
    val expected = assigns.groupBy(_._1).toSeq.map { case (shard, v) =>
      (shard, v.size.toLong, v.count(a => a._1 != a._2).toLong)
    }.sortBy(_._1)
    val got = run("q252_consistent_hash_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // consistent-hashing contract: only docs owned by the leaving shard
    // can move
    got.foreach { case (shard, _, moved) =>
      if (shard != 3L) assert(moved === 0L, s"shard $shard churned")
    }
  }

  test("q249 per-type trend equals brute-force DECIMAL moments") {
    val daily = events.groupBy(e => (e._3, e._4 / 86400000000L)).toSeq
      .map { case ((et, day), evs) => (et, BigInt(day), BigInt(evs.map(_._5).sum)) }
    val expected = daily.groupBy(_._1).toSeq.map { case (et, pts) =>
      val n = BigInt(pts.size)
      val sx = pts.map(_._2).sum
      val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val num = (n * sxy - sx * sy) * 1000000
      val den = n * sxx - sx * sx
      (et, pts.size.toLong, (num / den).toLong)
    }.sortBy(_._1)
    val got = run("q249_pertype_trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q250 MAD outlier fence equals brute-force recompute") {
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.length + 1) / 2 - 1)
    val expected = events.groupBy(_._3).toSeq.map { case (et, evs) =>
      val cents = evs.map(_._5)
      val med = lowerMedian(cents)
      val adev = cents.map(c => (c - med).abs)
      val mad = lowerMedian(adev)
      val out = adev.count(d => d * 10000 > mad * 44478).toLong
      (et, cents.length.toLong, out, out * 10000 / cents.length)
    }.sortBy(_._1)
    val got = run("q250_mad_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q247 Markov accuracy equals brute-force temporal-split replay") {
    val tus = events.map(_._4)
    val mid = (tus.min + tus.max) / 2
    val pairs = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      evs.sortBy(e => (e._4, e._1)).sliding(2).collect {
        case Seq(a, b) => (a._3, b._3, a._4, b._4)
      }
    }
    val train = pairs.filter(p => p._3 < mid && p._4 < mid)
      .groupBy(p => (p._1, p._2)).map { case (k, v) => k -> v.size.toLong }
    val pred = train.keys.map(_._1).toSeq.distinct.map { prev =>
      prev -> train.filter(_._1._1 == prev).toSeq
        .sortBy { case ((_, nxt), c) => (-c, nxt) }.head._1._2
    }.toMap
    val test = pairs.filter(p => p._3 >= mid && p._4 >= mid)
    val expected = test.groupBy(_._1).toSeq.map { case (prev, v) =>
      val n = v.size.toLong
      val ok = v.count(p => pred.get(prev).contains(p._2)).toLong
      (prev, n, ok, ok * 10000 / n)
    }.sortBy(_._1)
    val got = run("q247_markov_accuracy").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q248 label spreading equals brute-force neighbor majority") {
    val byId = docs.map(d => d._1 -> d._3).toMap
    def shingles(text: String): Set[String] = {
      val tk = toks(text)
      (0 to tk.length - 3).map(i =>
        s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
    }
    val sh = docs.map(d => (d._1, shingles(d._2)))
    val edges = for {
      (a, sa) <- sh; (b, sb) <- sh
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      un = sa.size + sb.size - inter
      if BigDecimal(inter.toDouble / un)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.5")
    } yield (a, b)
    val nbrs = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val expected = nbrs.toSeq.map { case (v, ws) =>
      val votes = ws.map(byId).groupBy(identity)
        .map { case (l, vs) => (l, vs.size) }.toSeq
        .sortBy { case (l, c) => (-c, l) }
      (byId(v), votes.head._1 == byId(v))
    }.groupBy(_._1).toSeq.map { case (lang, v) =>
      val n = v.size.toLong
      val ok = v.count(_._2).toLong
      (lang, n, ok, ok * 10000 / n)
    }.sortBy(_._1)
    val got = run("q248_label_spread").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q244 A/B readout equals brute-force md5 arm assignment") {
    val hex = "0123456789abcdef"
    val byUser = events.groupBy(_._2).toSeq.map { case (uid, evs) =>
      val arm = (hex.indexOf(md5hex(s"exp:$uid")(0)) % 2).toLong
      (arm, if (evs.exists(_._3 == "purchase")) 1L else 0L)
    }
    val arms = byUser.groupBy(_._1).toSeq.map { case (arm, v) =>
      val n = v.size.toLong
      val c = v.map(_._2).sum
      (arm, n, c, c * 10000 / n)
    }.sortBy(_._1)
    val r0 = arms.head._4
    val expected = arms.map { case (a, n, c, r) => (a, n, c, r, r - r0) }
    val got = run("q244_ab_readout").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q245 vocab drift equals brute-force half df counts") {
    val dfCounts = docs.flatMap { case (id, text, _) =>
      toks(text).distinct.map(w => (w, id % 2))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val words = dfCounts.keys.map(_._1).toSeq.distinct
    val expected = words.map { w =>
      val e = dfCounts.getOrElse((w, 0L), 0L)
      val o = dfCounts.getOrElse((w, 1L), 0L)
      (w, e, o, (e - o).abs)
    }.sortBy { case (w, e, _, d) => (-d, -e, w) }.take(20)
    val got = run("q245_vocab_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q242 attrition funnel equals brute-force gate replay") {
    val markers = graft.ops.TextOps.langMarkers
    def predLang(tk: Array[String]): String = {
      val scores = markers.map { case (l, ws) => l -> tk.count(ws.contains) }
      scores.find { case (_, s) => scores.forall(s >= _._2) }.get._1
    }
    def fp(text: String): String =
      md5hex(text.toLowerCase.trim.replaceAll("\\s+", " "))
    val feats = docs.map { case (id, text, _) =>
      val tk = toks(text)
      val g1 = qualityBp(text) >= 3000 && tk.length >= 5
      (id, g1, g1 && predLang(tk) == "en", fp(text))
    }
    val keep = feats.filter(_._3).groupBy(_._4)
      .map { case (f, v) => f -> v.map(_._1).min }
    val n0 = feats.size.toLong
    val n1 = feats.count(_._2).toLong
    val n2 = feats.count(_._3).toLong
    val n3 = feats.count(f => f._3 && keep(f._4) == f._1).toLong
    val ns = Seq(n0, n1, n2, n3)
    val expected = Seq("all", "quality_gate", "langid_en", "exact_dedup")
      .zipWithIndex.map { case (g, i) =>
        (i.toLong, g, ns(i), ns(i) * 10000 / n0,
          if (i == 0) 0L else ns(i - 1) - ns(i))
      }
    val got = run("q242_curation_attrition").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q243 admission counts equal brute-force per-hour quotas") {
    val expected = events.groupBy(_._2).toSeq.map { case (uid, evs) =>
      val admitted = evs.groupBy(e => e._4 / 3600000000L).map { case (_, h) =>
        math.min(h.size, 5).toLong
      }.sum
      (uid, evs.size.toLong, admitted, evs.size - admitted)
    }.sortBy(_._1)
    val got = run("q243_rate_limit_admission").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q240 DBSCAN roles and clusters equal brute-force union-find") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0), math.floor(e(0).toDouble * 1000).toLong,
          math.floor(e(1).toDouble * 1000).toLong)
      }
    val ids = pts.map(_._1)
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._1 != b._1 && math.max((a._2 - b._2).abs, (a._3 - b._3).abs) <= 25
    val nbrs = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1).toSet).toMap
    val core = ids.filter(v => nbrs(v).size >= 3).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(ids.map(v => v -> v): _*)
    def find(v: Long): Long =
      if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    for (v <- core; w <- nbrs(v) if core(w)) {
      val (rv, rw) = (find(v), find(w))
      if (rv != rw) parent(math.max(rv, rw)) = math.min(rv, rw)
    }
    val clusterOf = core.map(v => v -> core.filter(w => find(w) == find(v)).min).toMap
    val expected = ids.sorted.map { v =>
      if (core(v)) (v, "core", Some(clusterOf(v)))
      else {
        val coreNbrs = nbrs(v).filter(core)
        if (coreNbrs.nonEmpty) (v, "border", Some(coreNbrs.map(clusterOf).min))
        else (v, "noise", None)
      }
    }.toSeq
    val got = run("q240_dbscan_lite").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got === expected)
  }

  test("q241 rule metrics recompute from brute-force basket counts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = li.groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }
    val n = BigInt(baskets.size)
    val item = li.groupBy(_._2).map { case (pk, v) =>
      pk -> v.map(_._1).distinct.size.toLong
    }
    val support = baskets.toSeq.flatMap { b =>
      val s = b.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val top = support.toSeq.sortBy { case ((p1, p2), s) => (-s, p1, p2) }
      .take(20)
    val expected = top.map { case ((p1, p2), s) =>
      val (na, nb) = (item(p1), item(p2))
      (p1, p2, s, s * 10000 / na, s * 10000 / nb,
        (BigInt(s) * n * 1000000 / (BigInt(na) * BigInt(nb))).toLong)
    }
    val got = run("q241_association_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("q238 recall@10 equals brute-force double ranking") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        val q = e.map(v => math.floor(v.toDouble * 1000).toLong).toArray
        val lo = (0 until 32).map(k =>
          if (e(k).toDouble >= 0) 1L << k else 0L).sum
        val hi = (32 until 64).map(k =>
          if (e(k).toDouble >= 0) 1L << (k - 32) else 0L).sum
        (r.getLong(0), q, lo, hi)
      }
    val probes = rows.filter(_._1 % 100 == 7)
    val expected = probes.map { case (qid, qq, qlo, qhi) =>
      val others = rows.filter(_._1 != qid)
      def top10(score: ((Long, Array[Long], Long, Long)) => Long) =
        others.sortBy(r => (score(r), r._1)).take(10).map(_._1).toSet
      val exact = top10 { case (_, q, _, _) =>
        q.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      val ham = top10 { case (_, _, lo, hi) =>
        (java.lang.Long.bitCount(lo ^ qlo) +
          java.lang.Long.bitCount(hi ^ qhi)).toLong
      }
      val n = exact.intersect(ham).size.toLong
      (qid, n, n * 1000)
    }.sortBy(_._1).toSeq
    val got = run("q238_hamming_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q239 calibration deciles recompute from the quality score") {
    val byDecile = docs.map { case (_, text, lang) =>
      (qualityBp(text) / 1000, if (lang == "en") 1L else 0L)
    }.groupBy(_._1).toSeq.map { case (d, v) =>
      val n = v.size.toLong
      val pos = v.map(_._2).sum
      (d, n, pos, pos * 10000 / n)
    }.sortBy(_._1)
    val got = run("q239_quality_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === byDecile)
  }

  test("q231 dHash bits recompute from the text formula") {
    val expected = docs.collect {
      case (id, text, _) if id % 3 == 0 && text.length >= 33 =>
        val len = text.length
        var fp = 0L
        for (k <- 0 until 32) {
          val a = text.charAt((k.toLong * (len - 1) / 32).toInt).toInt
          val b = text.charAt(((k + 1).toLong * (len - 1) / 32).toInt).toInt
          if (b > a) fp |= (1L << k)
        }
        (id, fp)
    }
    val groupN = expected.groupBy(_._2).map { case (f, v) => f -> v.size.toLong }
    val exp = expected.map { case (id, fp) => (id, fp, groupN(fp)) }
      .sortBy(_._1)
    val got = run("q231_image_dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
  }

  test("q232 audio fingerprint recomputes from the text formula") {
    val expected = docs.collect {
      case (id, text, _) if id % 3 == 1 && text.length >= 16 =>
        val samples = text.map(c => c.toInt * 257 - 32768)
        val nw = samples.length / 8
        val energy = (0 until nw).map { w =>
          (0 until 8).map(k => samples(w * 8 + k).toLong).map(v => v * v).sum
        }
        val nbits = math.min(nw - 1, 32)
        var fp = 0L
        for (w <- 0 until nbits)
          if (energy(w + 1) > energy(w)) fp |= (1L << w)
        (id, nw.toLong, fp)
    }
    val groupN = expected.groupBy(_._3).map { case (f, v) => f -> v.size.toLong }
    val exp = expected.map { case (id, nw, fp) => (id, nw, fp, groupN(fp)) }
      .sortBy(_._1)
    val got = run("q232_audio_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === exp)
  }

  private lazy val events: Seq[(Long, Long, String, Long, Long)] =
    // (event_id, user_id, event_type, ts_micros, cents) via Tables.t so
    // the spec sees the same normalized timestamps as the queries
    Tables.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")),
        (org.apache.spark.sql.functions.col("value")
          .cast(org.apache.spark.sql.types.DecimalType(20, 2)) * 100)
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("q234 funnel equals brute-force per-user simulation") {
    val flags = events.groupBy(_._2).map { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      var mv = Long.MaxValue // first view so far (strictly before current)
      var mc = Long.MaxValue // first valid click so far
      var v = 0L; var c = 0L; var p = 0L
      sorted.foreach { case (_, _, et, ts, _) =>
        if (et == "view") v = 1
        if (et == "click" && mv < ts) c = 1
        if (et == "purchase" && mc < ts) p = 1
        // update AFTER the checks: frame is 1-preceding (strictly prior)
        if (et == "view" && ts < mv) mv = ts
        if (et == "click" && mv < ts && ts < mc) mc = ts
      }
      (v, c, p)
    }.toSeq
    val (nv, nc, np) =
      (flags.map(_._1).sum, flags.map(_._2).sum, flags.map(_._3).sum)
    val Array(row) = run("q234_funnel_conversion").collect()
    assert(row.getLong(0) === flags.size.toLong)
    assert(row.getLong(1) === nv)
    assert(row.getLong(2) === nc)
    assert(row.getLong(3) === np)
    assert(row.getLong(4) === np * 10000 / nv)
  }

  test("q235 retention cohorts equal brute-force day arithmetic") {
    val days = events.map { case (_, uid, _, tsMicros, _) =>
      (uid, tsMicros / 86400000000L) // UTC day number
    }
    val firstDay = days.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val expected = days.map { case (u, d) =>
      (firstDay(u), (d - firstDay(u)) / 7, u)
    }.distinct.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((cd, wk), v) => (cd, wk, v.size.toLong) }
      .sortBy(t => (t._1, t._2))
    val got = run("q235_retention_cohorts").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1),
        r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q246 quartiles equal brute-force ceil(p*n) order statistics") {
    val expected = events.groupBy(_._3).toSeq.map { case (et, evs) =>
      val sorted = evs.map(_._5).sorted
      val n = sorted.length.toLong
      def kth(num: Long, den: Long) =
        sorted(((num * n + den - 1) / den - 1).toInt)
      val (a, b, c) = (kth(1, 4), kth(1, 2), kth(3, 4))
      (et, a, b, c, c - a)
    }.sortBy(_._1)
    val got = run("q246_equidepth_quartiles").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q236 per-type median and MAD equal brute-force order statistics") {
    def lowerMedian(xs: Seq[Long]): Long = {
      val k = (xs.length + 1) / 2
      xs.sorted.apply(k - 1)
    }
    val expected = events.groupBy(_._3).toSeq.map { case (et, evs) =>
      val cents = evs.map(_._5)
      val m = lowerMedian(cents)
      (et, cents.length.toLong, m, lowerMedian(cents.map(c => (c - m).abs)))
    }.sortBy(_._1)
    val got = run("q236_event_value_mad").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q237 grid-blocked join finds exactly the brute-force L-inf pairs") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0), math.floor(e(0).toDouble * 1000).toLong,
          math.floor(e(1).toDouble * 1000).toLong)
      }
    val expected = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b
      d = math.max((ax - bx).abs, (ay - by).abs)
      if d <= 25
    } yield (a, b, d)).sortBy(t => (t._1, t._2)).toSeq
    val got = run("q237_grid_neighbor_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q233 scene cuts recompute from the frame formula") {
    val expected = docs.collect {
      case (id, text, _) if id % 3 == 2 && text.nonEmpty =>
        val len = text.length
        val nf = (3 + id % 3).toInt
        def byte(f: Int, p: Int): Int = text.charAt((f * 45 + p) % len).toInt
        var cuts = 0L; var total = 0L; var mx = 0L
        for (f <- 0 until nf - 1) {
          val diff = (0 until 45)
            .map(p => math.abs(byte(f + 1, p) - byte(f, p)).toLong).sum
          total += diff
          if (diff > mx) mx = diff
          if (diff > 2880) cuts += 1
        }
        (id, nf.toLong, cuts, total, mx)
    }.sortBy(_._1)
    val got = run("q233_scene_cuts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }
}
