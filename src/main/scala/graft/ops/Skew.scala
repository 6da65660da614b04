package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution concentrates on a few
  * hot values (the Zipf reality of word/user/document keys at 100 TB).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.Sessions.builder]]) handles sort-merge joins at
  * runtime; explicit salting remains the tool when the skewed side feeds a
  * SHUFFLE HASH join, when a single key exceeds what one task can hold, or
  * when the aggregation itself (not the join) is skewed.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a dimension side.
    *
    * The fact side gets a deterministic salt in [0, salts) derived from a
    * per-row distinguishing column (NOT the join key — the point is to
    * split identical keys); the dim side is replicated `salts`× with every
    * salt value. The shuffle then partitions on (key, salt): a hot key's
    * rows spread over `salts` reducers instead of one.
    *
    * Cost model: dim side bytes × salts (bounded — use for genuinely small
    * dims) versus the hot-key task's runtime ÷ salts. Result is identical
    * to `fact.join(dim, key)` for any salts ≥ 1.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 distinctor: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts: $salts")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(distinctor), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. For algebraic aggregates this is exactly
    * what partial aggregation already does; the explicit form exists for
    * aggregates whose partial state is per-key heavy (e.g. collect-style)
    * where the (key, salt) pre-shuffle bounds any single task's state.
    */
  def saltedCount(df: DataFrame, key: String, distinctor: Column,
                  salts: Int): DataFrame = {
    require(salts >= 1, s"salts: $salts")
    df.withColumn("__salt", pmod(hash(distinctor), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Join-key skew ADVISOR: the profiling pass one runs BEFORE choosing a
    * salt factor for [[saltedJoin]]/[[saltedCount]] (or trusting AQE) —
    * the hottest `topN` key values of a prospective shuffle key with, per
    * key: its row count, corpus share, skew ratio against the mean key
    * (`cnt·n_keys/total`), and the recommended salt (`ceil(skew_ratio)` —
    * the split count that brings the key's heaviest sub-task back to the
    * average key's size; 1 = no salting needed).
    *
    * Plan: one groupBy(key) count, a single-row (total, n_keys) aggregate
    * crossJoined back (broadcast, one row — the q_tfidf scalar pattern),
    * one top-N sort cut. The per-key count relation is the same
    * aggregation the skewed join itself would shuffle, so the advisor
    * costs one pass over the fact table at any scale. Skew math in doubles
    * (counts ≪ 2^53 — exact), tie-break on the key value so the cut is
    * deterministic.
    */
  def advisor(df: DataFrame, key: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN: $topN")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(stats))
      .select(col(key), col("cnt"),
        round(col("cnt").cast("double") / col("__total"), 6).as("share"),
        round(col("cnt").cast("double") * col("__nkeys") / col("__total"), 6)
          .as("skew_ratio"),
        ceil(col("cnt").cast("double") * col("__nkeys") / col("__total"))
          .cast("int").as("salt"))
      .orderBy(desc("cnt"), col(key))
      .limit(topN)
  }
}
