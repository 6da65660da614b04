package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout planning: Z-ORDER (Morton) interleaving — the
  * space-filling-curve clustering key behind multi-dimensional data
  * skipping (`OPTIMIZE ZORDER BY` in table formats): rows sorted by the
  * bit-interleaved image of two keys land so that every file/bucket covers
  * a NARROW range of BOTH keys at once, so min/max file stats prune scans
  * filtered on either dimension — where a plain sort on one key leaves the
  * other's per-file range at full width.
  *
  * Pure per-row bit arithmetic (shifts/masks — codegen'd, no shuffle); the
  * clustering itself is whatever write pattern consumes the column
  * (`repartitionByRange(zCol)` + sortWithinPartitions at 100 TB).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of `a` (even positions) and
    * `b` (odd positions) — non-overlapping powers so + ≡ bitwise-or,
    * which keeps the expression portable arithmetic. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The data-skipping audit for a prospective Z-order layout: bucket rows
    * by the high bits of their z-value (`bucket = z >> bucketShift` — a
    * contiguous Morton-curve segment ≈ one output file) and report each
    * bucket's row count and BOTH keys' min/max spans. Narrow spans on both
    * dimensions are exactly what lets file-level min/max stats prune —
    * this table is the evidence a layout decision reads, and its oracle is
    * plain arithmetic.
    */
  def zOrderStats(df: DataFrame, aCol: String, bCol: String, bits: Int,
                  bucketShift: Int): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift: $bucketShift")
    // long arithmetic throughout: an int input would overflow at shift 31
    df.select(col(aCol), col(bCol),
        zValue(col(aCol).cast("long"), col(bCol).cast("long"), bits).as("z"))
      .groupBy(shiftright(col("z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(aCol)).as(s"min_a"), max(col(aCol)).as(s"max_a"),
        min(col(bCol)).as(s"min_b"), max(col(bCol)).as(s"max_b"))
      .withColumn("span_a", col("max_a") - col("min_a"))
      .withColumn("span_b", col("max_b") - col("min_b"))
  }
}
