package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Deduplication for document corpora at scale.
  *
  * Three tiers, composable:
  *  1. exact       — group by content fingerprint (one shuffle on a 60-bit
  *                   key; shuffle volume = #distinct docs, not bytes).
  *  2. near (LSH)  — MinHash over shingle sets, banded into buckets; the
  *                   candidate generator is a *bucket self-join* (shuffle on
  *                   band hash), never an all-pairs product. All-pairs at
  *                   100 TB is ~10¹⁸ comparisons; LSH is linear in corpus
  *                   size for fixed bucket occupancy.
  *  3. verify      — exact n-gram Jaccard only on LSH candidates.
  *
  * MinHash math: P[band match] = 1-(1-j^r)^b for true Jaccard j. Defaults
  * (k=30, b=10, r=3) put the S-curve threshold at ~(1/10)^(1/3) ≈ 0.46:
  * j=0.9 pairs are missed with p≈2e-6, j=0.2 pairs bucket with p≈0.08.
  * Tune b·r=k per corpus; thresholds ≥0.8 with r=3 keep candidates sparse.
  */
object Dedup {

  /** Exact-duplicate clustering on a pre-computed fingerprint column:
    * one row per distinct fingerprint with the keeper (min id), copy count,
    * and the member ids. Deterministic for any partitioning.
    */
  def exactClusters(df: DataFrame, idCol: String, fpCol: String): DataFrame =
    df.groupBy(col(fpCol))
      .agg(
        min(col(idCol)).as("keeper"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("members"))

  /** MinHash signature (length k) of a shingle-set column. Per-row, narrow,
    * codegen'd: k minima over the shingle array, no explode, no shuffle.
    * NULL when the shingle set is empty (caller filters).
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    when(size(shingleSet) === 0, lit(null).cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(0), lit(k - 1)),
        i => array_min(transform(shingleSet, s => Hashes.h60Seeded(s, i)))))

  /** Band hashes for LSH: b hashes, each over r consecutive signature slots.
    * Equal band hash ⇒ the r minhashes agree ⇒ candidate pair.
    */
  def bandHashes(sig: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      j => Hashes.h60(concat_ws(",",
        transform(slice(sig, j * r + 1, lit(r)), _.cast("string")))))

  /** LSH candidate pairs from (id, shingleSet) rows: explode band hashes,
    * self-join per (band index, band hash) bucket, keep a<b, distinct.
    * The join is hash-partitioned on the band key — the scale path.
    */
  def candidatePairs(docs: DataFrame, idCol: String, shingleCol: String,
                     k: Int = 30, b: Int = 10, r: Int = 3): DataFrame = {
    require(b * r <= k, s"bands($b)×rows($r) exceed signature length $k")
    val sig = docs
      .where(size(col(shingleCol)) > 0)
      .select(col(idCol), minhashSignature(col(shingleCol), k).as("sig"))
    val buckets = sig.select(col(idCol),
        posexplode(bandHashes(col("sig"), b, r)).as(Seq("band", "bh")))
    val a = buckets.select(col("band"), col("bh"), col(idCol).as("id_a"))
    val bb = buckets.select(col("band"), col("bh"), col(idCol).as("id_b"))
    a.join(bb, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the shingle sets;
    * keeps pairs with similarity ≥ threshold. Two broadcast-or-shuffle hash
    * joins back to the (small relative to corpus) doc→set relation.
    */
  def verifiedNearDups(docs: DataFrame, idCol: String, shingleCol: String,
                       threshold: Double,
                       k: Int = 30, b: Int = 10, r: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("id"), col(shingleCol).as("sh"))
    candidatePairs(docs, idCol, shingleCol, k, b, r)
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Literal [2^0 … 2^60] — lets a lambda-bound (Column) bit index drive
    * bit tests: the `shiftright(c, Int)` builtin only takes a literal Int.
    */
  private val Pow2: Column = array((0 to 60).map(j => lit(1L << j)): _*)
  private def p2(i: Column): Column = element_at(Pow2, i + 1)

  /** Bit `i` of non-negative long `h`, as a boolean: h mod 2^(i+1) ≥ 2^i. */
  private def bitSet(h: Column, i: Column): Column =
    pmod(h, p2(i + 1)) >= p2(i)

  /** SimHash (60-bit) of a token array: per bit position, sum ±1 votes from
    * each token occurrence's hash bit, then pack the sign bits. Votes are
    * term-frequency weighted (duplicates kept on purpose — distinct-token
    * simhash collapses on corpora with a shared vocabulary). Near-identical
    * documents land within small Hamming distance; pair search is
    * `bit_count(a ^ b) <= d` on a compact integer — no arrays at join time.
    * Per-row and codegen'd; hashes computed once per token, not per bit.
    */
  def simhash(toks: Column): Column = {
    val hs = transform(toks, t => Hashes.h60(t))
    val bits = transform(
      sequence(lit(0), lit(59)),
      i => when(
        aggregate(hs, lit(0L),
          (acc, h) => acc + when(bitSet(h, i), 1L).otherwise(-1L)) > 0,
        p2(i)).otherwise(0L))
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
