package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String-similarity join: all pairs of values within a small edit
  * distance, found by FastSS deletion-neighborhood blocking (Bocek et al.,
  * "Fast Similarity Search in Large Dictionaries", 2007 — public
  * algorithm) instead of an all-pairs Levenshtein product.
  *
  * Blocking property (exact for maxDist = 1): if ed(u, v) ≤ 1 then u and
  * v share at least one key in {s} ∪ deletions₁(s) —
  *  - substitution at position i: deleting position i from both sides
  *    yields the same string;
  *  - insertion/deletion: the shorter string IS a deletion key of the
  *    longer (and its own identity key).
  * Sharing a key only bounds ed ≤ 2, so every candidate is verified with
  * the real `levenshtein` before emission — recall is exact, precision is
  * restored by the verify, the same candidates→verify contract as the
  * MinHash/SimHash families ([[Dedup]]).
  *
  * Scale posture: each distinct string of length L emits L+1 keys — the
  * index is O(Σ L) rows, the join is hash-keyed on `key`, and no step is
  * quadratic in the dictionary. Designed for name/title-length strings
  * (the entity-resolution use); for document-length text use the n-gram
  * Jaccard / MinHash family instead — a deletion neighborhood of a long
  * string is L copies of the string.
  */
object StringSim {

  /** Single-character-deletion neighborhood keys of `s`: the string
    * itself plus each of its length single-deletion variants.
    */
  def deletionKeys(s: Column): Column =
    array_union(
      array(s),
      array_distinct(transform(
        sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i)))))

  /** Distinct value pairs of `strCol` within edit distance 1, as
    * `(name_a, name_b, dist)` with `name_a < name_b`. Exact (the FastSS
    * recall property above + a Levenshtein verify).
    */
  def editDistance1Pairs(df: DataFrame, strCol: String): DataFrame = {
    val names = df.select(col(strCol).as("name"))
      .where(col("name").isNotNull).distinct()
    val keyed = names.select(col("name"),
      explode(deletionKeys(col("name"))).as("key"))
    keyed.as("a").join(keyed.as("b"), Seq("key"))
      .where(col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct() // two strings can share several deletion keys
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= 1)
  }
}
