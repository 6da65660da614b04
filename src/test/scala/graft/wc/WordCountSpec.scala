package graft.wc

import graft.SparkSpec

/** The reference's composed pipeline: counting semantics, the text-dir
  * source, per-file lineage, the CSV sink byte contract, and the
  * partition-invariance property the reference spends
  * `word_count_mpi.c:259-325` hand-building (SURVEY §2.3 items 4–8).
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  test("fromText: case-insensitive counts, lowercased keys, ascending order") {
    val df = Seq("The the THE", "fox, Fox. box").toDF("text")
    val rows = WordCount.fromText(df, "text").as[(String, Long)].collect().toSeq
    assert(rows === Seq(("box", 1L), ("fox", 2L), ("the", 3L)))
  }

  test("fromText: counts are weights-1 sums, not distinct (cell.c:10-15)") {
    val df = Seq("a a a b b c").toDF("text")
    val rows = WordCount.fromText(df, "text").as[(String, Long)].collect().toSeq
    assert(rows === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("fromDirectory: a dir of text files is one logical corpus (O1)") {
    val dir = tempDir("corpus")
    writeFile(dir, "a.txt", "Hello world\nhello")
    writeFile(dir, "b.txt", "WORLD! again")
    val rows = WordCount.fromDirectory(spark, dir.toString)
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("again", 1L), ("hello", 2L), ("world", 2L)))
  }

  test("fromDirectory with a custom delimiter file (define_delimiters analogue)") {
    val dir = tempDir("corpus2")
    writeFile(dir, "a.txt", "a,b|c,d")
    val ddir = tempDir("delims2")
    writeFile(ddir, "d.txt", "|") // comma NOT a delimiter under this config
    val rows = WordCount
      .fromDirectory(spark, dir.toString, Some(ddir.resolve("d.txt").toString))
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("a,b", 1L), ("c,d", 1L)))
  }

  test("perFile keeps per-file lineage and per-file counts") {
    val dir = tempDir("corpus3")
    writeFile(dir, "a.txt", "x x y")
    writeFile(dir, "b.txt", "y z")
    val rows = WordCount.perFile(spark, dir.toString)
      .as[(String, String, Long)].collect().toSeq
      .map { case (f, w, c) => (f.split('/').last, w, c) }
    assert(rows === Seq(
      ("a.txt", "x", 2L), ("a.txt", "y", 1L),
      ("b.txt", "y", 1L), ("b.txt", "z", 1L)))
  }

  /** §5.3 property: the result is independent of how the input bytes are
    * split into partitions — the invariant the reference's byte-range
    * boundary repair exists to guarantee (`word_count_mpi.c:296-322`).
    * We vary `spark.sql.files.maxPartitionBytes` so the text source
    * actually produces different byte-range splits of the same file.
    */
  test("partition invariance: counts identical for 1/2/4/7-ish byte splits") {
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val corpus = Seq.fill(400)(
      Seq.fill(1 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
      .mkString("\n")
    val dir = tempDir("corpusInv")
    writeFile(dir, "big.txt", corpus)

    val conf = "spark.sql.files.maxPartitionBytes"
    val costConf = "spark.sql.files.openCostInBytes"
    val saved = spark.conf.get(conf)
    val savedCost = spark.conf.get(costConf)
    try {
      val results = Seq("16", "128", "1024", "1048576").map { bytes =>
        spark.conf.set(conf, bytes)
        spark.conf.set(costConf, "0")
        WordCount.fromDirectory(spark, dir.toString)
          .as[(String, Long)].collect().toSeq
      }
      assert(results.distinct.size === 1,
        "word counts must not depend on byte-split boundaries")
      // and the total equals the number of tokens in the corpus
      val expectedTotal = corpus.split("\\s+").count(_.nonEmpty)
      assert(results.head.map(_._2).sum === expectedTotal)
    } finally {
      // restore BOTH confs — the session is shared across suites, and a
      // leaked openCostInBytes=0 changes split counts for plan-sensitive
      // specs that run later (ordering-dependent flakes)
      spark.conf.set(conf, saved)
      spark.conf.set(costConf, savedCost)
    }
  }

  test("writeCsv: golden bytes — header Word,Count, asc order, single part file") {
    val df = Seq("b a c a").toDF("text")
    val out = tempDir("csvout").resolve("res").toString
    WordCount.writeCsv(WordCount.fromText(df, "text"), out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(parts.length === 1, "reference contract: one CSV file (rank-0 write)")
    val content = new String(
      java.nio.file.Files.readAllBytes(parts.head.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(content === "Word,Count\na,2\nb,1\nc,1\n")
  }

  test("golden end-to-end: CSV over the reference's own words.txt corpus") {
    // /root/reference/words.txt is the corpus the reference repo ships
    // (116,877 words, one per line, UTF-8 with accented vowels). Ground
    // truth is an independent single-threaded JVM count below — a direct
    // byte-walk over the delimiter SET, sharing no code with the engine's
    // regex/split/aggregate pipeline — byte-compared against the CSV sink.
    val src = java.nio.file.Paths.get("/root/reference/words.txt")
    assume(java.nio.file.Files.isReadable(src))
    val dir = tempDir("golden")
    java.nio.file.Files.copy(src, dir.resolve("words.txt"))
    val out = tempDir("goldenOut").resolve("res").toString
    WordCount.writeCsv(WordCount.fromDirectory(spark, dir.toString), out)
    val part = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .head
    val produced = new String(
      java.nio.file.Files.readAllBytes(part.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

    val text = new String(java.nio.file.Files.readAllBytes(src),
      java.nio.charset.StandardCharsets.UTF_8)
    val delims = graft.tok.Tokenizer.DefaultDelimiters
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) {
      val w = sb.toString.toLowerCase(java.util.Locale.ROOT)
      counts.update(w, counts.getOrElse(w, 0L) + 1L)
      sb.clear()
    }
    text.foreach(c => if (delims.contains(c)) flush() else sb.append(c))
    flush()
    // 116,877 lines, and the delimiter set splits hyphen/apostrophe words
    // (d'acqua → d, acqua), so the token total under reference semantics
    // can only be ≥ the line count. The walker is the ground truth (the
    // engine is byte-compared against it below); a pinned exact total
    // would break on any upstream change to the read-only corpus even
    // though the engine is correct, so only sanity-bound it here.
    assert(counts.values.sum >= 116877L, "at least one token per corpus line")
    val expected = "Word,Count\n" +
      counts.toSeq.sortBy(_._1).map { case (w, c) => s"$w,$c\n" }.mkString
    assert(produced === expected)
  }

  test("empty input dir yields an empty result (engine side of exit-1 contract)") {
    val dir = tempDir("emptyc")
    writeFile(dir, "a.txt", ",,, ...")
    assert(WordCount.fromDirectory(spark, dir.toString).count() === 0L)
  }
}
