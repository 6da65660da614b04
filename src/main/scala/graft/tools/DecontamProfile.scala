package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** One-off phase profiler for the decontamination pair (bench r9):
  * times the Bloom build, the filtered-train pass, and the full query
  * for both the exact and Bloom forms at a given sf dir. Not part of
  * the gated surface — a diagnosis tool like NeardupProfile.
  */
object DecontamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("decontam-profile")
    import spark.implicits._
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def trainH = Dedup.hashedNgrams(
      docs.withColumn("toks", TextAnalysis.tokens(col("text"))), "doc_id", "toks", 5)
    def benchH = trainH.where(pmod(col("id"), lit(100)) === 0)
      .select((col("id") + 900000).as("id"), col("hs"))
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      t("bench scan+hash (count)") { benchH.select(sum(size(col("hs")))).head() }
      t("bloom treeAggregate") {
        benchH.select(col("hs")).rdd.treeAggregate(
          org.apache.spark.util.sketch.BloomFilter.create(4000000L, 0.01))(
          (bf, row) => { row.getSeq[Long](0).foreach(bf.putLong); bf },
          (a, b) => a.mergeInPlace(b))
      }
      t("exact full") {
        Dedup.contaminationPairs(trainH, benchH, 3, 100)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      t("bloom full") {
        Dedup.contaminationPairsBloom(trainH, benchH, 3, 100)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
