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
}
