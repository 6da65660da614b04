package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for [[StringSim]]: the deletion-neighborhood key algebra,
  * and — the property the whole operator reduces to — blocked search ==
  * brute-force all-pairs Levenshtein on dictionaries built to stress
  * every edit kind (substitution, insertion, deletion, and near-misses
  * at distance 2).
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  test("deletionKeys: identity + each single deletion, deduplicated") {
    val keys = Seq("abc").toDF("s")
      .select(StringSim.deletionKeys(col("s")).as("k"))
      .as[Seq[String]].head()
    assert(keys.toSet === Set("abc", "bc", "ac", "ab"))
    // repeated characters collapse ("aab" deletions: ab, ab, aa)
    val dup = Seq("aab").toDF("s")
      .select(StringSim.deletionKeys(col("s")).as("k"))
      .as[Seq[String]].head()
    assert(dup.toSet === Set("aab", "ab", "aa"))
    assert(dup.length === 3, "duplicate deletion keys must be deduped")
  }

  test("editDistance1Pairs: every edit kind found, distance-2 rejected") {
    val dict = Seq("kitten", "mitten", "kitte", "kittens", "sitting",
      "bolt", "bold", "colt", "jolt", "volt", "belt")
      .toDF("name")
    val pairs = StringSim.editDistance1Pairs(dict, "name")
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(pairs.contains(("kitten", "mitten")), "substitution missed")
    assert(pairs.contains(("kitte", "kitten")), "deletion missed")
    assert(pairs.contains(("kitten", "kittens")), "insertion missed")
    assert(!pairs.exists(p => p._1 == "sitting" || p._2 == "sitting"),
      "sitting is distance >= 2 from everything here")
    // the bolt-cluster substitutions are all found, nothing beyond d=1
    assert(pairs.contains(("belt", "bolt")) && pairs.contains(("bold", "bolt")))
    assert(!pairs.contains(("bold", "colt")), "bold/colt is distance 2")
  }

  test("editDistance1Pairs == brute-force all-pairs on a generated dictionary") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def word() = (0 until (3 + rnd.nextInt(4)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val words = (0 until 120).map(_ => word()).distinct
    val dict = words.toDF("name")
    val blocked = StringSim.editDistance1Pairs(dict, "name")
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    val brute = (for {
      a <- words; b <- words if a < b
      if levenshteinDistance(a, b) <= 1
    } yield (a, b)).toSet
    assert(blocked === brute)
  }

  /** JVM-side reference Levenshtein (classic DP) — independent of both
    * Spark's and the blocking under test. */
  private def levenshteinDistance(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
