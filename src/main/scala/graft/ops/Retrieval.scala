package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval post-processing: rank fusion and result
  * diversification — the steps between per-modality rankers (BM25,
  * embedding ANN) and the final result list a retrieval-augmented
  * pipeline consumes.
  *
  * Scale posture: both operators run AFTER the rankers' top-k cut, so
  * their inputs are k-row relations regardless of corpus size — the
  * 100 TB cost lives in the rankers themselves ([[CorpusStats.bm25TopK]],
  * [[Similarity.topKNeighborsLsh]]), which are the bucketed scale paths.
  * For a batch of queries, add the query id to every join/window key and
  * the same plans apply per group with no new shuffle structure.
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR 2009):
    * rrf(d) = Σ_r 1 / (kRrf + rank_r(d)) over the rankings that contain d.
    *
    * `rankings` are (name, df) pairs where each df has columns
    * (`id`, `rank`) — rank 1-based, already top-k-cut. The result carries
    * one `<name>_rank` column per input (null where the ranking missed the
    * id) plus the fused `rrf` score, rounded to 6 so the float is
    * engine-portable (the repo-wide oracle rounding discipline).
    *
    * The fold of full-outer joins runs over k-row inputs, so its
    * exchanges are trivial at any corpus size (full-outer equi-joins are
    * not broadcastable — Spark plans them sort-merge/shuffled-hash; the
    * cost that matters stays in the rankers, per the object doc).
    * Determinism: the score is a fixed-order sum of N terms
    * (N = rankings.size, a constant), each 1/(kRrf+rank) an exact
    * IEEE division — no accumulation-order sensitivity.
    *
    * Ranking names must be distinct: each becomes a `<name>_rank` output
    * column, and a duplicate would either fail ambiguous-column
    * resolution or silently double-count in the score (ADVICE r10).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], kRrf: Int = 60,
              topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"rrfFuse: ranking names must be distinct, got " +
        rankings.map(_._1).mkString(", "))
    require(kRrf >= 1, s"rrfFuse: kRrf=$kRrf")
    val named = rankings.map { case (name, df) =>
      name -> df.select(col("id"), col("rank").cast("int").as(s"${name}_rank"))
    }
    val joined = named.map(_._2).reduce(_.join(_, Seq("id"), "full_outer"))
    val score = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(s"${name}_rank")), lit(0.0))
    }.reduce(_ + _)
    joined.select(
      (col("id") +: round(score, 6).as("rrf") +:
        named.map { case (name, _) => col(s"${name}_rank") }): _*)
      .orderBy(desc("rrf"), col("id"))
      .limit(topK)
  }

  /** Ranker-agreement diagnostic over two top-k cuts — the number read
    * before trusting a fusion: how much do the lexical and dense legs
    * even agree? Near-zero overlap means the retrievers see different
    * corpora (vocabulary mismatch, embedding drift) and RRF is averaging
    * noise; near-total overlap means the second ranker adds nothing.
    *
    * Inputs are (`id`, `rank`) relations, 1-based, already top-k-cut
    * (any two [[rrfFuse]]-shaped legs). Output is ONE row:
    * `n_a`, `n_b`, `n_overlap`, `jaccard` (overlap / union of the two id
    * sets), and `mean_rank_gap` — the average |rank_a − rank_b| over the
    * shared ids (NULL when the overlap is empty; integer-derived doubles
    * rounded 6, the portable discipline).
    *
    * Scale: one full-outer join of two k-row relations + one 1-row
    * aggregate — corpus-size-independent, per the object doc.
    */
  def rankOverlap(a: DataFrame, b: DataFrame): DataFrame = {
    val ja = a.select(col("id"), col("rank").cast("int").as("rank_a"))
    val jb = b.select(col("id"), col("rank").cast("int").as("rank_b"))
    val both = col("rank_a").isNotNull && col("rank_b").isNotNull
    ja.join(jb, Seq("id"), "full_outer")
      .agg(
        sum(when(col("rank_a").isNotNull, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("rank_b").isNotNull, 1L).otherwise(0L)).as("n_b"),
        sum(when(both, 1L).otherwise(0L)).as("n_overlap"),
        count(lit(1)).as("n_union"),
        sum(when(both, abs(col("rank_a") - col("rank_b")).cast("long"))
          .otherwise(0L)).as("gap_sum"))
      .select(col("n_a"), col("n_b"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_union"), 6)
          .as("jaccard"),
        when(col("n_overlap") > 0,
          round(col("gap_sum").cast("double") / col("n_overlap"), 6))
          .as("mean_rank_gap"))
  }

  /** Result-list diversification: drop any result whose similarity to a
    * higher-ranked result is ≥ `threshold` — the one-pass (non-greedy)
    * relaxation of MMR that stays a pure join/anti-join, so it is
    * expressible in any SQL engine and needs no sequential driver loop.
    * (Greedy MMR compares only against *kept* higher ranks; this form is
    * strictly more aggressive and order-equivalent on its survivors.)
    *
    * `ranked` has (`id`, `rank`, `vec`); similarity is exact cosine via
    * [[Similarity.cosineExact]] (decimal-summed dot, rounded to 6 — the
    * oracle-portable form). The self-join is rank_i < rank_j over a
    * top-k-cut input: O(k²) pairs on k rows, never corpus-scale.
    */
  def diversify(ranked: DataFrame, threshold: Double): DataFrame = {
    val hi = ranked.select(col("rank").as("hi_rank"), col("vec").as("hi_vec"))
    val suppressed = ranked.as("r")
      .join(hi, col("hi_rank") < col("rank") &&
        (Similarity.cosineExact(col("vec"), col("hi_vec")) >= threshold),
        "left_semi")
      .select(col("id"))
    ranked.join(suppressed, Seq("id"), "left_anti")
  }
}
