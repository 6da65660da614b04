package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for ALGEBRAIC aggregates — the identity a
  * warehouse leans on to keep a day-partitioned rollup current without
  * rescanning history: aggregate the new partition alone, then MERGE the
  * partial relations. Valid exactly for the mergeable kinds (count and
  * decimal sums are additive, min/max idempotent-combinable; averages ride
  * as sum+count pairs, distinct counts as HLL sketches — the same algebra
  * Spark's own partial/final aggregation and every `q_hll_merge`-style
  * sketch fold run on).
  *
  * The merge IS a re-aggregation of the unioned partials — one shuffle on
  * the group keys sized by |base keys| + |delta keys|, not by raw rows. At
  * 100 TB the base side is the stored rollup (small); a fresh day's delta
  * joins it without touching any other partition — the gate query proves
  * the identity merge(agg(old), agg(new)) == agg(all) against an oracle
  * that computes the direct full aggregate.
  */
object Ivm {

  /** Merge partial-aggregate relations sharing the schema
    * (`keys…`, `cntCol`, `sumCols…`, `minCols…`, `maxCols…`). Inputs must
    * be aggregates over DISJOINT row sets (partials), else counts/sums
    * double-count — that is the caller's partition contract.
    */
  def mergeAggregates(base: DataFrame, delta: DataFrame, keys: Seq[String],
                      cntCol: String, sumCols: Seq[String],
                      minCols: Seq[String] = Nil,
                      maxCols: Seq[String] = Nil): DataFrame =
    mergeAll(base.unionByName(delta), keys, cntCol, sumCols, minCols, maxCols)

  /** The n-way form: fold a relation of stacked partials (any number of
    * disjoint-row-set aggregates unioned — e.g. every micro-batch's
    * partial a streaming ingest wrote) into the merged aggregate. The
    * two-way [[mergeAggregates]] is this over base ∪ delta.
    */
  def mergeAll(partials: DataFrame, keys: Seq[String], cntCol: String,
               sumCols: Seq[String], minCols: Seq[String] = Nil,
               maxCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "mergeAll: no keys")
    val aggs =
      Seq(sum(col(cntCol)).as(cntCol)) ++
        sumCols.map(c => sum(col(c)).as(c)) ++
        minCols.map(c => min(col(c)).as(c)) ++
        maxCols.map(c => max(col(c)).as(c))
    partials
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
