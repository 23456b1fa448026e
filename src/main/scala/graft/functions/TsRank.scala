package graft.functions

/** Faithful transcription of PostgreSQL's ts_rank algorithm (the published
  * `tsrank.c` semantics, documented in PG docs §12.3.3 "Ranking Search
  * Results") — the reference orders dashboard search results with
  * `ts_rank(search_vector, plainto_tsquery(...))` (db_extractor.py:51).
  *
  * Published algorithm, unweighted positions (all default 'D', w = 0.1):
  *  - single-term query (calc_rank_or): with k occurrences of the term,
  *      resj  = Σ_{j=0..k-1} w / (j+1)²          (sequential accumulation)
  *      rank  = ((w + resj) - w) / (π²/6)         (wjm = w, jm = 0)
  *    so the rank is a pure function of k, with k capped at 256 — tsvectors
  *    keep at most 256 positions per lexeme.
  *  - AND query of two terms (calc_rank_and): over every position pair
  *    (a, b) of the two terms,
  *      curw = sqrt(w · w · word_distance(|a-b|))
  *      rank ← (rank < 0) ? curw : 1 - (1 - rank)(1 - curw),  rank₀ = -1
  *    where word_distance(d) = 1 / (1.005 + 0.05·e^{d/1.5}) for d ≤ 100 and
  *    1e-30 beyond — so curw takes at most 101 distinct values.
  *  - normalization flag 32 maps rank → rank/(rank+1).
  *
  * Declared deviations from the C engine (documented, not semantic):
  * arithmetic in IEEE double rather than Postgres float4, and the pair
  * iteration order is pinned to (a ascending, b ascending). Both matter
  * only in the last bits; both are mirrored exactly in the DuckDB oracles,
  * which consume THESE tables as literals (shortest round-trip repr), so
  * the driver compare is exact.
  *
  * At 100 TB the scale story is the lookup itself: the per-document score
  * is a pure function of tiny per-document position arrays, so the whole
  * ranking is one narrow projection — no shuffle, no UDF; the fold is a
  * Catalyst `aggregate` over an array that never leaves the row.
  */
object TsRank {
  /** Default position weight ('D') from the published default
    * {0.1, 0.2, 0.4, 1.0} weight vector. */
  val W = 0.1

  /** π²/6 normalizer, exactly the constant the published source uses. */
  val PiSq6 = 1.64493406685

  /** Single-term rank by occurrence count k (array index k-1), k = 1..256.
    * The running resj reproduces the C loop's exact addition sequence. */
  val termScore: Array[Double] = {
    var resj = 0.0
    (1 to 256).map { k =>
      resj += W / (k.toDouble * k)
      ((W + resj) - W) / PiSq6
    }.toArray
  }

  /** Pair weight curw by clamped distance d (array index d-1): d = 1..100
    * real distances, index 100 (d ≥ 101) the far-pair 1e-30 branch. */
  val curw: Array[Double] = {
    val near = (1 to 100).map { d =>
      math.sqrt(W * W * (1.0 / (1.005 + 0.05 * math.exp(d / 1.5))))
    }
    (near :+ math.sqrt(W * W * 1e-30)).toArray
  }

  /** Reference fold for specs: rank of one document's pair-distance list. */
  def foldPairs(dists: Seq[Int]): Double =
    dists.foldLeft(-1.0) { (acc, d) =>
      val c = curw(math.min(d, 101) - 1)
      if (acc < 0) c else 1.0 - (1.0 - acc) * (1.0 - c)
    }

  /** Shortest round-trip repr, parsed back via string→DOUBLE (correctly
    * rounded in both engines). A bare decimal literal would be DECIMAL in
    * DuckDB and could re-round on the way to DOUBLE. */
  private def fmt(x: Double): String =
    s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"

  /** `(k, score)` VALUES list for the DuckDB oracle — identical doubles. */
  def termScoreValuesSql: String = termScore.zipWithIndex
    .map { case (v, i) => s"(${i + 1}, ${fmt(v)})" }.mkString(", ")

  /** 101-entry DOUBLE list literal for the DuckDB oracle fold. */
  def curwListSql: String = curw.map(fmt).mkString("[", ", ", "]")
}
