ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "greenplum_dwhspark"
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
// The round driver parses the bench result from the TAIL of sbt's stdout,
// which has failed four rounds running for two reasons: sbt's logger
// prefixes every forked-process line with "[info] " (corrupting the JSON
// line itself), and the "[success] Total time: ..." epilogue lands after
// it. StdoutOutput passes the forked JVM's stdout through RAW (no logger,
// no prefix) and showSuccess drops the epilogue — so the LAST stdout line
// of a `runMain graft.Bench` run IS the bare compact result JSON.
// (Failures still print "[error]" lines and fail the exit code.)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command engine, not a task — silence the
// unused-key lint
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 200-query suite generates thousands of whole-stage-codegen classes.
  // Spark's generated-class cache holds only 100 (static conf) and the
  // JVM's default code cache 240 MB; both overflow mid-suite, so janino
  // recompiles evicted classes and HotSpot flushes+re-JITs warm code —
  // measured on the q49 replay as 24-154 s of JIT time PER RUN (GC was
  // 0.5-1.2 s) and as erratic 5-30× whole-JVM slowdown windows. Sized
  // for any long-lived executor running a many-plan workload, not for
  // this bench alone.
  s"-Dspark.sql.codegen.cache.maxEntries=${
    sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096")}",
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)
