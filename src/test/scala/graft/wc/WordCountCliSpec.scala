package graft.wc

import org.scalatest.funsuite.AnyFunSuite

/** CLI arg/precondition contract (`word_count_mpi.c:25-56` parse_arg,
  * `:415-422` empty-dir exit). Pure-JVM — no Spark session needed.
  */
class WordCountCliSpec extends AnyFunSuite {

  test("parseArgs accepts known --flag value pairs") {
    assert(WordCountCli.parseArgs(Array("--path", "/x", "--out", "/y"))
      === Some(Map("path" -> "/x", "out" -> "/y")))
    assert(WordCountCli.parseArgs(Array("--path", "/x", "--delimiters", "d.txt"))
      === Some(Map("path" -> "/x", "delimiters" -> "d.txt")))
  }

  test("parseArgs rejects unknown flags, odd arity, flag-as-value") {
    assert(WordCountCli.parseArgs(Array("--nope", "/x")).isEmpty)
    assert(WordCountCli.parseArgs(Array("--path")).isEmpty)
    assert(WordCountCli.parseArgs(Array("--path", "--out")).isEmpty)
    assert(WordCountCli.parseArgs(Array("path", "/x")).isEmpty)
  }

  test("hasRegularFile: true iff the dir contains at least one regular file") {
    val dir = java.nio.file.Files.createTempDirectory("cli")
    dir.toFile.deleteOnExit()
    assert(!WordCountCli.hasRegularFile(dir.toString), "empty dir")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
    assert(!WordCountCli.hasRegularFile(dir.toString), "subdir is not a regular file")
    java.nio.file.Files.write(sub.resolve("f.txt"), "x".getBytes)
    assert(!WordCountCli.hasRegularFile(dir.toString), "not recursive (DT_REG at top level)")
    java.nio.file.Files.write(dir.resolve("g.txt"), "y".getBytes)
    assert(WordCountCli.hasRegularFile(dir.toString))
  }

  test("hasRegularFile: false for a missing path or a plain file") {
    assert(!WordCountCli.hasRegularFile("/does/not/exist"))
    val f = java.nio.file.Files.createTempFile("cli", ".txt")
    f.toFile.deleteOnExit()
    assert(!WordCountCli.hasRegularFile(f.toString))
  }
}
