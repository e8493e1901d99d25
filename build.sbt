ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ploverdbspark"
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
// Forked runs default to sbt's LoggedOutput, which prefixes every program
// line with "[info] " / "[error] " — that broke machine-parsing of the
// Bench JSON line for two rounds. StdoutOutput inherits the child's
// stdout/stderr verbatim; showSuccess drops the trailing
// "[success] Total time" line so the bench JSON is the last stdout line.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // Heap sized to the host (128 GiB, local[32]): at 8g the full 108-key
  // bench run thrashed — the heavy pipeline/ANN keys' execution memory
  // evicted the cached serving fixture and left GC pressure that
  // inflated every interleaved point lookup ~2x (r12: g15 p50 414 ms in
  // the full run vs 179 ms with the same code benched alone; g19
  // 232 vs 125, g05 482 vs 275). 32g holds the fixture caches, the
  // operators' materialized frames and execution memory side by side —
  // the same sizing a real 32-core executor of this memory class gets.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // G1 stays on its DEFAULT 200 ms pause target: an r13 experiment with
  // -XX:MaxGCPauseMillis=50 shrank the young gen so aggressively on the
  // 32g heap that GC frequency exploded — the per-query floor doubled
  // (0.12 -> 0.25 s) and the published-key sum went 1.21 -> 2.75 s.
  // Occasional ~100-200 ms young pauses are the cheaper jitter.
)
