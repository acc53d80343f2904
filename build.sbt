ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openetlspark"
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
// Driver bench contract (r17 verdict #2): the driver parses the LAST
// stdout line of `sbt "runMain graft.Bench"` as bare JSON. sbt's default
// logged output strategy prefixes every forked-run line with "[info] "
// and appends a "[success] Total time: ..." trailer, so the contract
// silently never held (parsed: null in BENCH_r01..r17). StdoutOutput
// passes the forked JVM's stdout through verbatim; showSuccess drops
// the trailer. Bench.scala's summary JSON is then the true last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 16g default on the 128 GiB box: the r4 driver-side bench ran 2×
  // slower than the same run locally, concentrated in the GC-heavy
  // queries (persists + 32-thread shuffles in one JVM) — headroom is
  // cheaper than thrash. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
