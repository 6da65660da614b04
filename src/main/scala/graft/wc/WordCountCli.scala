package graft.wc

import org.apache.spark.sql.SparkSession

/** CLI entry mirroring the reference binary's contract
  * (`word_count_mpi.c:25-56` `parse_arg`: `--path <dir>`; output
  * `csv_results.csv` with header `Word,Count`, `word_count_mpi.c:132-142`).
  *
  * Usage: runMain graft.wc.WordCountCli --path <textDir> --out <csvDir>
  *        [--delimiters <file>]
  *
  * Exit 1 on missing/empty input dir, matching `word_count_mpi.c:415-422`.
  */
object WordCountCli {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val path = opts.getOrElse("path", {
      System.err.println("usage: WordCountCli --path <dir> --out <dir> [--delimiters <file>]")
      sys.exit(1)
    })
    val out = opts.getOrElse("out", "csv_results")
    val dir = new java.io.File(path)
    if (!dir.isDirectory || dir.listFiles().forall(!_.isFile)) {
      System.err.println(s"error: $path is not a directory with files")
      sys.exit(1)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-wordcount")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wc = WordCount.fromDirectory(spark, path, opts.get("delimiters"))
    WordCount.writeCsv(wc, out)
    spark.stop()
  }
}
