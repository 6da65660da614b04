package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared by every suite in the forked test JVM — session
  * startup is ~5 s, so per-suite sessions would dominate test wall-clock.
  * Built through [[Sessions.builder]] so tests run with the exact conf the
  * engine entry points use (UTC, AQE, extensions, nanosAsLong).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Base class for engine suites: shared session + temp-dir helper. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Fresh temp dir, deleted on JVM exit (tests stay rerunnable). */
  def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  def writeFile(dir: java.nio.file.Path, name: String, content: String): Unit =
    java.nio.file.Files.write(dir.resolve(name),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
