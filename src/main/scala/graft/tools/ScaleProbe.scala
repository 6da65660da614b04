package graft.tools

import org.apache.spark.sql.functions._

/** One-off scale probe (VERDICT r10 #6): replicate the documents and
  * embeddings fixtures N× with remapped ids into `target/scaleprobe/`,
  * then run selected `SparkEntry.queries` entries at 1× and N× under the
  * bench protocol (one untimed warm execution, then a timed noop-sink
  * execution) and print both times. Purpose: one-number evidence that
  * the top-k/group-count-bound operators (q_rrf_hybrid's fuse,
  * q_mixture_sample's quota draw) do not grow super-linearly with corpus
  * size — their corpus-scale stages are the rankers/draw scan, their
  * result-scale stages are k-row. Not part of the gated surface — a
  * diagnosis tool like DecontamProfile.
  *
  * Replica k shifts ids by k·10⁹, so every replicated row is a distinct
  * document/vector; replica 0 is the original corpus, which keeps
  * q_rrf_hybrid's probe vector (vec_id = 0) a single row at any factor.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val queries = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("q_rrf_hybrid", "q_mixture_sample"))
    require(factor >= 2, s"factor: $factor")
    val spark = graft.Sessions.local("scale-probe")
    val outDir = s"target/scaleprobe/x$factor"

    val reps = spark.range(factor).select(col("id").as("rep"))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("rep") * 1000000000L)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("rep") * 1000000000L)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val nDocs = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[scaleprobe] replicated corpus: $nDocs docs at $outDir")

    def timed(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = once()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      t
    }
    queries.foreach { q =>
      val t1 = timed(q, sfDir)
      val tN = timed(q, outDir)
      println(f"[scaleprobe] $q%-18s 1x ${t1}%.3f s   ${factor}x ${tN}%.3f s   ratio ${tN / t1}%.2f")
    }
    spark.stop()
  }
}
