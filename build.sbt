ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rustdiskannspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the bench's
// one-line JSON from stdout. sbt's default output strategy routes the
// forked JVM's stdout through its logger as "[info] {...}" and appends
// its own "[success] Total time ..." line — the driver's parser has
// rejected that in every round (PERF per_query empty since r01).
// StdoutOutput hands the forked process sbt's raw stdout/stderr
// descriptors (program stdout passes through verbatim; Spark's log4j
// output stays on stderr), and showSuccess drops the trailing
// [success] line, so the bench JSON is the bare FINAL stdout line.
// Timing in Bench.scala is untouched.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — exclude
// it from the unused-key lint so the warning doesn't pollute stdout
Global / excludeLintKeys += showSuccess
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
scalacOptions += "-deprecation"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench JVM holds ~63 queries' shared caches
  // (indexes, shingle sets, verified pairs, PQ codebooks) at sf0.1;
  // 8g left Spark's unified storage region close enough to eviction
  // that cached-plan reuse was at the mercy of GC timing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
