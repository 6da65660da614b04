package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup tiers: exact clustering, MinHash+LSH near-dup with a planted pair,
  * and SimHash Hamming behavior (north-star LLM-pipeline operators).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "near the warm fire and the birds sing in the tall green trees outside"
  private val nearDup = base.replace("green", "leafy") // 1-word edit
  private val unrelated =
    "completely different content about database engines and distributed " +
      "query processing with columnar storage formats and vectorized execution"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("exactClusters groups by fingerprint with min-id keeper and members") {
    val withFp = docs.withColumn("fp", TextAnalysis.contentFingerprint(col("text")))
    val clusters = Dedup.exactClusters(withFp, "doc_id", "fp")
      .select("keeper", "n_copies", "members")
      .as[(Long, Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    assert(clusters.map(c => (c._1, c._2)) === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    assert(clusters.head._3 === Seq(1L, 4L))
  }

  test("minhashSignature: length k, deterministic, null on empty shingle set") {
    val df = docs.withColumn("sh", TextAnalysis.shingleSet(col("text"), 3))
    val sigs = df.select(Dedup.minhashSignature(col("sh"), 30).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.length === 30))
    val again = df.select(Dedup.minhashSignature(col("sh"), 30).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.toSeq === again.toSeq)
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 5)).collect()
    assert(empty.head.isNullAt(0))
  }

  test("identical shingle sets ⇒ identical signatures (exact dup agreement)") {
    val df = docs.where(col("doc_id").isin(1, 4))
      .withColumn("sh", TextAnalysis.shingleSet(col("text"), 3))
    val sigs = df.select(Dedup.minhashSignature(col("sh"), 30)).as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
  }

  test("LSH candidatePairs finds the planted near-dup, not the unrelated doc") {
    val sh = docs.withColumn("sh", TextAnalysis.shingleSet(col("text"), 3))
    val pairs = Dedup.candidatePairs(sh, "doc_id", "sh")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)),
      "high-jaccard pairs must bucket together")
    assert(pairs.contains((1L, 4L)), "exact dups always share every band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not be a candidate, got $pairs")
  }

  test("verifiedNearDups thresholds candidates by exact Jaccard") {
    val sh = docs.withColumn("sh", TextAnalysis.shingleSet(col("text"), 3))
    val verified = Dedup.verifiedNearDups(sh, "doc_id", "sh", threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = verified.map(v => (v._1, v._2)).toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup survives verification")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(verified.find(v => (v._1, v._2) == (1L, 4L)).get._3 === 1.0)
    val j12 = verified.find(v => (v._1, v._2) == (1L, 2L)).get._3
    assert(j12 > 0.5 && j12 < 1.0)
  }

  test("simhashNearDupPairs (pigeonhole blocking) equals the all-pairs search") {
    val rnd = new scala.util.Random(11)
    // clustered fingerprints: 20 seeds, each with variants 0-4 bit flips
    // away, plus uniform noise rows → plenty of pairs inside/outside d=5
    val fps = (0 until 20).flatMap { s =>
      val seed = rnd.nextLong() & ((1L << 60) - 1)
      (0 until 4).map { v =>
        var h = seed
        (0 until rnd.nextInt(5)).foreach(_ => h ^= 1L << rnd.nextInt(60))
        (s * 10 + v).toLong -> h
      }
    } ++ (1000 until 1050).map(i => i.toLong -> (rnd.nextLong() & ((1L << 60) - 1)))
    val df = fps.toDF("id", "fp")
    val blocked = Dedup.simhashNearDupPairs(df, "id", "fp", maxHamming = 5)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val a = df.select(col("id").as("id_a"), col("fp").as("h_a"))
    val b = df.select(col("id").as("id_b"), col("fp").as("h_b"))
    val allPairs = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hammingDistance(col("h_a"), col("h_b")).as("hamming"))
      .where(col("hamming") <= 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(blocked === allPairs)
    assert(allPairs.nonEmpty, "fixture must actually contain close pairs")
  }

  test("simhashNearDupPairs block layout has no empty block for any maxHamming") {
    // regression: uniform ceil-width blocks left whole blocks above bit 59
    // for many maxHamming values (e.g. 10), bucketing the entire corpus
    // together; the blocked result must still equal all-pairs there
    val rnd = new scala.util.Random(21)
    val fps = (0 until 60).map(i => i.toLong -> (rnd.nextLong() & ((1L << 60) - 1)))
    val df = fps.toDF("id", "fp")
    for (d <- Seq(0, 3, 10, 13)) {
      val blocked = Dedup.simhashNearDupPairs(df, "id", "fp", d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val a = df.select(col("id").as("id_a"), col("fp").as("h_a"))
      val b = df.select(col("id").as("id_b"), col("fp").as("h_b"))
      val allPairs = a.join(b, col("id_a") < col("id_b"))
        .where(Dedup.hammingDistance(col("h_a"), col("h_b")) <= d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(blocked === allPairs, s"maxHamming=$d")
    }
  }

  test("simhash: near-identical docs land within small Hamming distance") {
    val df = docs.withColumn("sh", Dedup.simhash(TextAnalysis.tokens(col("text"))))
    val hs = df.select("doc_id", "sh").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(1L) === hs(4L), "identical docs: distance 0")
    assert(ham(hs(1L), hs(2L)) <= 12, "1-word edit: small distance")
    assert(ham(hs(1L), hs(3L)) > 12, "unrelated doc: large distance")
    // hammingDistance column form agrees with the JVM computation
    val d = df.where(col("doc_id") === 1).select(col("sh").as("a"))
      .crossJoin(df.where(col("doc_id") === 3).select(col("sh").as("b")))
      .select(Dedup.hammingDistance(col("a"), col("b"))).as[Int].head()
    assert(d === ham(hs(1L), hs(3L)))
  }
}
