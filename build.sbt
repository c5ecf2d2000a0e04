ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ngramscollocationshadoopspark"
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
// The bench driver retains a tail of stdout and parses the LAST complete
// JSON line in it. sbt's default logger decorates every forked-process
// line with "[info] " and appends a "[success] Total time" trailer — both
// of which defeat a plain json-loads of the tail lines (BENCH_rN.json has
// had "parsed": null since round 1). StdoutOutput pipes the forked JVM's
// stdout through verbatim; showSuccess drops the trailer, leaving the
// bench's final compact JSON line as the literal last line of output.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command layer, not by settings/tasks — the
// unused-key lint can't see that
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
  // 16g default (was 8g): a local[32] session gives execution+storage
  // ~0.6x the heap shared by 32 task threads; at 8g the heavy dedup tier
  // ran GC-bound in long sweeps (r12 median/min gaps up to 3x that
  // vanished in isolation). The box has 125 GiB; 16g halves collection
  // frequency without changing any plan.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
