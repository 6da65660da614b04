package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: all pairs (a, b) whose half-open time intervals
  * intersect — `a.start < b.end AND b.start < a.end` — without a cartesian
  * or broadcast-nested-loop plan (SURVEY §2.2 "Joins — range/as-of"; the
  * third temporal-join family member next to [[AsofJoin]] and the binned
  * point-in-range join).
  *
  * Plan — the classic BINNED interval join:
  *
  *   1. each side explodes its interval into the fixed-width time bins it
  *      touches (`sequence(startBin, lastBin)` → narrow generate; half-open
  *      end ⇒ `lastBin = (endMicros − 1) div binMicros`);
  *   2. one hash EQUI-join on the bin id (+ the overlap predicate as a
  *      post-filter) — Catalyst plans a shuffled hash/sort-merge join, AQE
  *      skew-splitting applies, and a small side broadcasts by size;
  *   3. a pair overlapping k shared bins would surface k times — the
  *      OWNERSHIP filter `bin == bin(greatest(a.start, b.start))` keeps
  *      exactly one copy (the overlap's first instant lies in precisely one
  *      bin, and any overlapping pair shares that bin), so no distinct is
  *      needed.
  *
  * Cost: |A|·spanA/bin + |B|·spanB/bin exploded rows, join fan-out = true
  * overlap pairs per bin — never |A|×|B|. Pick `binSeconds` near the median
  * interval length: too wide piles unrelated intervals into one bucket
  * (candidate bloat), too narrow multiplies the explode factor. Hot bins
  * (a global rush hour) are an AQE-skew case, same as any hash join.
  *
  * Contract: column names of `a` and `b` must be disjoint; interval ends are
  * EXCLUSIVE (zero-length and merely-touching intervals do not match, the
  * standard half-open convention). Timestamps are compared at microsecond
  * precision via `unix_micros`.
  *
  * Output: all columns of `a`, then `b`, then `overlap_secs` (double
  * seconds, exact micros/1e6).
  */
object IntervalJoin {

  def overlapJoin(a: DataFrame, b: DataFrame,
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  binSeconds: Long): DataFrame = {
    require(binSeconds >= 1, s"binSeconds: $binSeconds")
    val dup = a.columns.toSet.intersect(b.columns.toSet)
    require(dup.isEmpty, s"overlapJoin: ambiguous columns $dup")
    val binUs = binSeconds * 1000000L
    // div-by-literal on unix micros: values ≪ 2^53, floor(x / c) on the
    // double image is exact for every reachable timestamp. The
    // cast("timestamp") accepts TIMESTAMP_NTZ inputs (micros-preserving
    // under the engine's pinned UTC session zone; a no-op on TIMESTAMP).
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    def binOf(c: org.apache.spark.sql.Column) =
      floor(us(c) / binUs).cast("long")
    // empty/inverted intervals overlap nothing under half-open semantics —
    // dropped BEFORE the explode (a descending sequence would otherwise
    // enumerate bins backwards and mis-bucket them)
    val ax = a.where(col(aEnd) > col(aStart)).withColumn("__bin",
      explode(sequence(binOf(col(aStart)),
        floor((us(col(aEnd)) - 1) / binUs).cast("long"))))
    val bx = b.where(col(bEnd) > col(bStart)).withColumn("__bin",
      explode(sequence(binOf(col(bStart)),
        floor((us(col(bEnd)) - 1) / binUs).cast("long"))))
    ax.join(bx, Seq("__bin"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bin") === binOf(greatest(col(aStart), col(bStart))))
      .drop("__bin")
      .withColumn("overlap_secs",
        (us(least(col(aEnd), col(bEnd))) -
          us(greatest(col(aStart), col(bStart)))) / lit(1000000.0))
  }
}
