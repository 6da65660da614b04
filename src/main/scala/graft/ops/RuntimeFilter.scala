package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime-filter semi-join: the Bloom-pushdown pattern every modern
  * engine applies to selective joins (Spark's own runtime row-group
  * filters, the classic semi-join reduction) made explicit — build a
  * Bloom filter over the build side's join keys, PREFILTER the probe side
  * map-side before any shuffle, then verify exactly with the keyed
  * semi-join. Identical rows to the plain semi-join, never approximate:
  * Blooms have no false negatives, and the false positives are exactly
  * the rows the verify join then drops. What it buys at 100 TB: the probe
  * side's shuffle shrinks from |fact| rows to |matching ∪ fp| rows — for
  * a selective build side that is the difference between shuffling the
  * whole fact table and shuffling a rounding error of it.
  *
  * The probe-side predicate is the native codegen'd
  * [[graft.expr.BloomMightContainLong]] (the q_decontam_bloom pattern) so
  * the prefilter fuses into the scan stage.
  */
object RuntimeFilter {

  /** Semi-join `fact` to the distinct keys of `build` on long-typed
    * `key`, Bloom-prefiltered. `expectedKeys` sizes the filter — past it
    * the Bloom degrades toward fpp→1 (still exact, just less selective),
    * reported loudly on stderr like the decontamination twin.
    */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame, key: String,
                    fpp: Double = 0.01,
                    expectedKeys: Long = 1000000L): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp: $fpp")
    require(expectedKeys >= 1, s"expectedKeys: $expectedKeys")
    val keys = build.select(col(key)).distinct()
    val (bloom, inserted) = keys.rdd.treeAggregate(
        (org.apache.spark.util.sketch.BloomFilter.create(expectedKeys, fpp), 0L))(
      (acc, row) =>
        if (row.isNullAt(0)) acc
        else { acc._1.putLong(row.getLong(0)); (acc._1, acc._2 + 1) },
      (a, b) => { a._1.mergeInPlace(b._1); (a._1, a._2 + b._2) })
    if (inserted > expectedKeys)
      System.err.println(
        s"[graft] bloomSemiJoin: inserted $inserted keys into a Bloom sized " +
          s"for $expectedKeys — effective fpp exceeds $fpp (results stay " +
          "exact); raise expectedKeys")
    val bloomB = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = graft.expr.BloomMightContainLong(bloomB) _
    fact.where(mightContain(col(key)))
      .join(keys, Seq(key), "left_semi")
  }
}
