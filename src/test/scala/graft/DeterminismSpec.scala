package graft

/** The property the driver's hash gate ultimately depends on: every
  * registered query's RESULT must not depend on how the data is
  * partitioned. Runs the whole registry twice with different
  * spark.sql.shuffle.partitions and compares row multisets — any
  * order-dependent double accumulation, unbroken tie in a limit, or
  * partition-dependent sketch threshold fails HERE instead of as an
  * opaque driver hash mismatch. (Multiset compare: presentation sorts
  * need not break every tie; the driver sorts rows before hashing.) */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query is shuffle-partition-count invariant") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          val a = fn(spark, dir).collect().map(_.toString).sorted.toSeq
          spark.conf.set("spark.sql.shuffle.partitions", "7")
          val b = fn(spark, dir).collect().map(_.toString).sorted.toSeq
          if (a == b) None
          else Some(s"$name: ${a.length} vs ${b.length} rows, first diff " +
            a.zip(b).find { case (x, y) => x != y }.orElse(
              Some((a.drop(b.length).headOption.getOrElse(""),
                b.drop(a.length).headOption.getOrElse("")))).get)
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
        }
    }
    assert(failures.isEmpty,
      s"partition-order-dependent queries:\n${failures.mkString("\n")}")
  }
}
