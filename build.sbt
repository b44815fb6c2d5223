ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mysql2clickhousespark"
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
// The bench harness parses a JSON *final* line from the tail of sbt's
// output. sbt's "[success] Total time: ..." trailer and the forked-run
// "[info] " logger prefix both broke that parse for five rounds —
// suppress the trailer and pass forked stdout through verbatim.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // default sized for the bench host (125 GiB): 97 queries share one JVM
  // and an 8g heap showed cross-query GC contention inflating per-query
  // times ~3x over their isolated cost
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~100 registered queries x whole-stage codegen overflow the default
  // 240 MB JIT code cache; once it fills the compiler shuts off and later
  // queries run interpreted, showing as random 3-6x per-query spikes in
  // full bench runs that vanish in isolation
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // the cap-bounded IN pushdowns (MaxProbePushIds = 1000, matching
  // Sessions' parquet inFilterThreshold) reach parquet-mr as an ~1000-deep
  // OR tree whose column-index evaluator recurses per node; under the
  // additional codegen frames of a scan task that overflows the default
  // 1 MB thread stack (observed once as a task-killing StackOverflowError
  // in an r15 maintenance run). 8 MB of mostly-virtual stack per thread
  // removes the cliff without touching the pushdown's pruning power.
  "-Xss8m",
)
// Stale JUnit XML from deleted suites inflates report counts (a removed
// scratch suite kept counting for two rounds) — wipe the reports dir
// before each test run so target/test-reports is exactly this run.
Test / testOptions += Tests.Setup(() => IO.delete(file("target/test-reports")))
// The sf0.001 test suites don't need the bench-host heap above, and a
// 24g -Xmx can get a memory-limited dev/CI cgroup OOM-killed — tests
// fork with a conservative default instead (override: SPARK_TEST_MEM).
Test / javaOptions ~= (opts => opts.filterNot(_.startsWith("-Xmx")) :+
  s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "8g")}")
