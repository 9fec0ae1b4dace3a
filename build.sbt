ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "s2spark"
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
// Driver bench-parse contract (VERDICT r21 #2): the grading driver reads
// the bench's stdout tail and parses its final line as JSON, but sbt's
// default output strategy routes forked-process stdout through the sbt
// logger, prefixing every line with "[info] " and appending a
// "[success] Total time ..." line — BENCH_r18..r21 all carry
// `parsed: null` because of it. Pass the forked JVM's stdout/stderr
// through verbatim and drop the trailing [success] line, so the bench's
// bare one-line summary JSON is the final stdout line (the full
// per-query map is persisted to BENCH_local.json alongside, see README).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by another task —
// exclude it from the unused-key lint so the warning doesn't precede
// every run's output
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // container locale is POSIX; UTF-8 filenames (non-ASCII stream names)
  // need the JVM's filesystem encoding pinned
  "-Dsun.jnu.encoding=UTF-8", "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
