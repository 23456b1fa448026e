ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nashvilleetlservicebackupspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// stream the forked process's output raw instead of via sbt's logger:
// the bench/verify harness lines (e.g. Bench's one-line JSON) must reach
// stdout without an "[info] " prefix so callers can parse them
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local-mode driver IS the executor: 32 concurrent tasks share this
  // heap, and the allocation-heavy codec queries thrash young-gen at
  // 8g (measured: full bench 162.2s/30.0s GC at 8g vs 150.5s/21.1s GC
  // at 16g, bench/r15opt_mid_{8g,16g}.json). 16g is 12.5% of the
  // 128 GiB box; override via SPARK_DRIVER_MEM as before.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
