package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.ops.{Dedup, TextAnalysis}

/** Test-scope stage profiler for the near-dup pipeline (not part of the
  * library). Run: sbt 'Test/runMain graft.tools.NeardupProfile <sfDir>'
  */
object NeardupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("neardup-profile")
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = Tables.table(spark, dir, "documents")
      .withColumn("sh", TextAnalysis.shingleSet(col("text"), 3))
    val hashed = Dedup.hashedShingles(docs, "doc_id", "sh")

    time("tokenize+shingle (strings)") {
      docs.select(col("doc_id"), col("sh"))
    }
    time("hashedShingles (md5)") { hashed }
    time("minhash sigs") {
      hashed.select(col("id"), Dedup.minhashSignatureFromHashes(col("hs"), 30).as("sig"))
    }
    time("buckets+join (cand pairs)") {
      Dedup.candidatePairsFromHashes(hashed)
    }
    time("full verifiedNearDups") {
      Dedup.verifiedNearDups(docs, "doc_id", "sh", 0.8)
    }
    println("[profile] candidate pairs: " + Dedup.candidatePairsFromHashes(hashed).count())
    spark.stop()
  }
}
