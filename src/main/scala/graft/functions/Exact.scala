package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final
  * aggregation order differs from any single-threaded oracle — so every
  * money/measure aggregate in the query surface goes through an exact
  * decimal accumulator instead:
  *
  *   per-row double arithmetic (deterministic: fixed op order, identical
  *   IEEE semantics in Spark and DuckDB)
  *     → cast to DECIMAL(28,10)   (no representable midpoints at scale 10
  *        for non-terminating binary fractions → identical rounding)
  *     → SUM (exact, associative, order-independent)
  *     → cast back to double, ROUND at the output edge.
  *
  * The DuckDB oracle mirrors the same shape:
  * `ROUND(CAST(SUM(CAST(expr AS DECIMAL(28,10))) AS DOUBLE), n)`.
  */
object Exact {

  private val Dec = "decimal(28,10)"

  /** Order-independent exact sum of a double expression, surfaced as double. */
  def exactSum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** `exactSum` rounded for the output contract (default money scale 4). */
  def roundSum(c: Column, scale: Int = 4): Column = round(exactSum(c), scale)

  /** Deterministic average: exact decimal sum / non-null count, rounded.
    * Denominator is `count(c)` (ignores NULLs) so the result matches SQL
    * AVG semantics — `count(lit(1))` would count NULL rows (ADVICE r02). */
  def roundAvg(c: Column, scale: Int = 6): Column =
    round(exactSum(c) / count(c), scale)

  /** Exact long sum for integral-valued doubles (e.g. l_quantity). */
  def longSum(c: Column): Column = sum(c.cast("long"))
}
