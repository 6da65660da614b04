ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mpiwordcountspark"
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
// Forked run/runMain output goes RAW to stdout/stderr instead of through
// sbt's logger: the logger prefixes every stdout line with "[info] ", and
// the bench harness's one-line JSON contract was reaching the driver as
// "[info] {...}" — unparseable as a bare JSON line (every BENCH_r*.json
// carried parsed:null). StdoutOutput removes the prefix; test execution is
// unaffected (results travel over sbt's test listener, not stdout).
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Forked-JVM heap for `run` (Bench/Verify/tools): the full bench sweep runs
// 100+ queries in one JVM with per-query MEMORY_AND_DISK persists, and at 8g
// the tail of the sweep ran under visible GC/eviction pressure on the
// 128 GiB local[32] bench box (BENCH_r08's q_fingerprint/q_mi inflation on
// code-unchanged paths). But a fixed 24g default would let the fork
// swap/OOM-kill smaller contributor machines, so the default scales to the
// host: min(24g, half of physical RAM), floor 2g, fallback 8g where
// /proc/meminfo is unavailable; SPARK_DRIVER_MEM overrides unconditionally.
// Scoped to `run` only (ADVICE r09 #2): the test suite runs tiny fixtures on
// local[4] and keeps the pre-r9 fixed 8g — a host-scaled heap there only
// delays GC and starves parallel suites on small machines.
val forkHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val halfRamMb =
    try
      scala.util.Using.resource(scala.io.Source.fromFile("/proc/meminfo")) {
        _.getLines()
          .collectFirst { case l if l.startsWith("MemTotal:") =>
            l.split("\\s+")(1).toLong }
          .map(_ / 1024 / 2).getOrElse(8L * 1024)
      }
    catch { case _: Throwable => 8L * 1024 }
  s"${math.max(2L * 1024, math.min(24L * 1024, halfRamMb))}m"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkHeap",
)
// appended AFTER the project-level -Xmx: the JVM takes the last -Xmx, so
// tests run at a fixed 8g while run/runMain (Bench, Verify, tools) keep
// the host-scaled heap above regardless of sbt's task-scope delegation
Test / javaOptions += "-Xmx8g"
