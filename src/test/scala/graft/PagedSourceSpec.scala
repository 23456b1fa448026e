package graft

import graft.sources.PagedApi
import graft.sources.PagedApi.ApiRow
import org.apache.spark.sql.functions._

/** The DSv2 paged-API source: page-per-partition planning, source-tier
  * filter pushdown (the reference's ArcGIS `where=`), and column
  * pruning (`outFields=`). */
class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = (1L to 1050L).map(i =>
    ApiRow(i, s"event_$i", if (i % 3 == 0) "music" else "sports",
      (i % 100).toDouble + 0.5))

  private def read(pageSize: Int) = {
    PagedApi.backend = fixture
    spark.read.format("graft.sources.PagedApiProvider")
      .option("pagesize", pageSize.toString).load()
  }

  test("round-trips the backend exactly, one partition per page") {
    val df = read(200)
    assert(df.count() == 1050)
    // 1050 rows / 200 per page -> 6 pages -> 6 input partitions
    assert(df.rdd.getNumPartitions == 6)
    // spot-check content fidelity
    val r = df.filter($"id" === 7L).collect()
    assert(r.length == 1 && r(0).getString(1) == "event_7" &&
      r(0).getString(2) == "sports")
  }

  test("predicates push to the source; results stay correct") {
    PagedApi.pushedFilterLog.clear()
    val df = read(500).filter($"price" > 90.0 && $"category" === "music")
    val got = df.collect()
    val expect = fixture.count(r => r.price > 90.0 && r.category == "music")
    assert(got.length == expect && expect > 0)
    val pushed = PagedApi.pushedFilterLog.toArray.map(_.toString).toSet
    assert(pushed.exists(_.contains("GreaterThan(price")), pushed)
    assert(pushed.exists(_.contains("EqualTo(category")), pushed)
    // and the plan itself reports the pushdown (what an operator reads)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PagedApiScan pushed="), plan.take(2000))
  }

  test("column pruning reaches the source (outFields analogue)") {
    PagedApi.requestedColumnsLog.clear()
    val names = read(400).select("name").collect()
    assert(names.length == 1050)
    val asked = PagedApi.requestedColumnsLog.toArray.map(_.toString)
    assert(asked.exists(_ == "name"),
      s"source asked for more than the projection: ${asked.mkString(";")}")
  }

  test("unsupported predicates stay above the scan, never lost") {
    val df = read(300).filter(length($"name") > 8) // not pushable
    // event_1..event_9 have length 7; event_10.. length >= 8... compute
    val expect = fixture.count(_.name.length > 8)
    assert(df.count() == expect)
  }
}
