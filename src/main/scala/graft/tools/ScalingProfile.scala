package graft.tools

import org.apache.spark.sql.SparkSession

/** Strong-scaling measurement for the word-count pipeline — the direct
  * analogue of the reference's headline benchmark (strong scaling of
  * MPI word count over a fixed multi-GB corpus; Documentation.md §3 in
  * the reference repo reports ≈15× at 16 physical cores). This main
  * (a) synthesizes a fixed corpus of text files under `target/scaling`
  * (replicating the reference's `words.txt` plus the testdata document
  * bodies until the requested size), then (b) times the full
  * tokenize→count→sort pipeline at a ladder of local[N] widths, one
  * fresh SparkSession per width, reporting seconds and speedup vs N=1.
  * Diagnosis/benchmark tool, not gated surface.
  *
  * Usage: runMain graft.tools.ScalingProfile [targetMB] [widths,...]
  */
object ScalingProfile {
  def main(args: Array[String]): Unit = {
    val targetMb = args.headOption.map(_.toInt).getOrElse(1024)
    val widths = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8, 16, 32))
    val dir = java.nio.file.Paths.get("target/scaling/corpus")

    // ── corpus synthesis (deterministic, reused across runs) ───────────
    val sizeNow =
      if (java.nio.file.Files.isDirectory(dir))
        java.nio.file.Files.list(dir).mapToLong(p => p.toFile.length).sum()
      else 0L
    if (sizeNow < targetMb * 1024L * 1024L) {
      java.nio.file.Files.createDirectories(dir)
      val seedPaths = Seq(
        "/root/reference/words.txt").map(java.nio.file.Paths.get(_))
        .filter(java.nio.file.Files.isReadable(_))
      val seed = new StringBuilder
      seedPaths.foreach { p =>
        seed.append(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      }
      // widen the vocabulary beyond words.txt with the testdata docs, if
      // present (read-only input; output stays under target/)
      val docs = java.nio.file.Paths.get("/root/testdata/sf0.01/documents.parquet")
      if (java.nio.file.Files.exists(docs)) {
        val spark = SparkSession.builder().master("local[4]")
          .appName("scaling-corpus").getOrCreate()
        try {
          spark.read.parquet(docs.toString).select("text")
            .limit(2000).collect()
            .foreach(r => seed.append(r.getString(0)).append('\n'))
        } finally spark.stop()
      }
      val block = seed.toString.getBytes("UTF-8")
      val perFile = 64L * 1024 * 1024
      val nFiles = math.max(1,
        math.ceil(targetMb * 1024.0 * 1024.0 / perFile).toInt)
      val repsPerFile = math.max(1, (perFile / block.length).toInt)
      for (i <- 0 until nFiles) {
        val f = dir.resolve(f"part-$i%04d.txt")
        if (!java.nio.file.Files.exists(f) || f.toFile.length < perFile) {
          val out = new java.io.BufferedOutputStream(
            java.nio.file.Files.newOutputStream(f), 1 << 20)
          try (0 until repsPerFile).foreach(_ => out.write(block))
          finally out.close()
        }
      }
    }
    val corpusBytes =
      java.nio.file.Files.list(dir).mapToLong(p => p.toFile.length).sum()
    println(f"[scaling] corpus ${corpusBytes / 1024.0 / 1024.0}%.0f MB at $dir")

    // ── strong scaling: fixed corpus, growing width ────────────────────
    var t1 = Double.NaN
    widths.foreach { n =>
      val spark = graft.Sessions.builder("graft-scaling", n.toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // warm (JIT, codegen, page cache), then timed — Bench protocol
        def run(): Unit = graft.wc.WordCount.fromDirectory(spark, dir.toString)
          .write.mode("overwrite").format("noop").save()
        run()
        val t0 = System.nanoTime(); run()
        val sec = (System.nanoTime() - t0) / 1e9
        if (t1.isNaN) t1 = sec
        println(f"[scaling] local[$n%2d]  $sec%7.2f s  speedup ${t1 / sec}%5.2f×  " +
          f"${corpusBytes / sec / 1024 / 1024}%6.0f MB/s")
      } finally spark.stop()
    }

    // ── weak scaling: fixed bytes PER THREAD, growing width ────────────
    // The reference's second curve (efficiency t1/tN at 1 GB per node,
    // ≈0.90 on m4 — Documentation.md:466). Per-width input = the first
    // ceil(n × perThreadFiles) corpus files, so the byte/thread ratio is
    // constant while the file set stays a prefix (stable enumeration).
    val files = java.nio.file.Files.list(dir).sorted().toArray
      .map(_.toString)
    val perThreadFiles = math.max(1, files.length / widths.max)
    var tw1 = Double.NaN
    widths.foreach { n =>
      val take = math.min(files.length, n * perThreadFiles)
      val spark = graft.Sessions.builder("graft-weak", n.toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        def run(): Unit =
          graft.wc.WordCount.fromText(
              spark.read.text(files.take(take): _*), "value",
              graft.tok.Tokenizer.DefaultSplitRegex)
            .write.mode("overwrite").format("noop").save()
        run()
        val t0 = System.nanoTime(); run()
        val sec = (System.nanoTime() - t0) / 1e9
        if (tw1.isNaN) tw1 = sec
        println(f"[weak]    local[$n%2d]  $take%3d files  $sec%7.2f s  " +
          f"efficiency ${tw1 / sec}%5.2f")
      } finally spark.stop()
    }
  }
}
