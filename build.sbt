ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "demyspark"
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
// Driver bench-parse contract (r20, VERDICT item 2): every BENCH_r*.json
// since ~r15 has `parsed: null` because sbt's default LoggedOutput relays
// the forked JVM's stdout with an "[info] " prefix and appends its own
// "[success] Total time" line — both defeat the driver's tail parser for
// the bench's one JSON line. StdoutOutput passes the forked process's
// stdout/stderr through verbatim (Spark's log4j noise stays on stderr,
// the JSON line lands bare on stdout), and showSuccess drops the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// the outputStrategy key is consulted through forkOptions, which sbt's
// lintUnused can't see — without this the lint WARN itself lands on the
// stdout the driver tails
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // local[32] with 100k+-row shuffles per task needs real heap; 8g causes
  // GC storms that make bench timings erratic (observed 10x swings)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~300 queries x warmup + repeated timed runs generate far more unique
  // Janino/codegen classes than the JDK17 default 240 MB code cache holds;
  // a full code cache disables JIT compilation mid-suite, which reads as
  // a ~2x slowdown on whichever queries run after the fill (the BENCH_r15
  // fz01/fz02 session-vs-solo gap). Size it for the full suite.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "768m")}",
)
