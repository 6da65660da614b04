package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `right.time <= left.time` within the same key group (the time-series
  * join the reference's relational surface generalizes to; SURVEY §2.2
  * "Joins — range/as-of").
  *
  * Implementation is the union-and-scan form, not a theta join:
  *
  *   1. tag left rows (marker 1) and right rows (marker 0), union them;
  *   2. one hash exchange on the key, one per-key sort by (time, marker);
  *   3. `last(right payload, ignoreNulls).over(unboundedPreceding..current)`
  *      carries the latest right values forward onto each left row.
  *
  * Why: the naive `left.join(right, key && r.t <= l.t)` + argmax builds
  * O(|L|·|R|) intermediate rows per key before pruning — a scale-killer on
  * skewed keys. The union form is one shuffle of |L|+|R| rows and a linear
  * scan per key, the same cost profile as any windowed aggregation, and AQE
  * skew-splitting applies to it. Ties (equal time): the right row sorts
  * before the left row (marker 0 < 1), so an exactly-simultaneous right row
  * IS visible to the left row — `<=` semantics, matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t` (the oracle used in the gate query).
  *
  * Contract: (key, time) must uniquely identify right rows (pre-aggregate
  * duplicates first — see the gate query) or the carried values are
  * sort-order dependent.
  *
  * @param left      left (probe) frame
  * @param right     right (reference) frame
  * @param on        equi-key column name present in both frames
  * @param leftTime  left event-time column (orderable type)
  * @param rightTime right event-time column (same type)
  * @param rightVals right payload columns to carry; surfaced as
  *                  `asof_<name>` (null when no right row precedes)
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, on: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val t = "__asof_t"
    val m = "__asof_m"
    val p = "__asof_p"
    // The right payload travels as ONE struct column: the struct is
    // non-null for every right row even when individual payload fields are
    // NULL, so `last(_, ignoreNulls)` matches the latest right ROW (and
    // its possibly-NULL values) rather than skipping to an older row whose
    // field happened to be non-null — and all carried fields always come
    // from the same matched row. Matches DuckDB ASOF JOIN semantics.
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(m, lit(1))
      .select(Seq(col(on), col(t), col(m)) ++
        leftCols.filterNot(_ == on).map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightVals.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))).as(p): _*)
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(m, lit(0))
      .select(Seq(col(on), col(t), col(m)) ++
        leftCols.filterNot(_ == on).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as(p): _*)
    val w = Window.partitionBy(col(on))
      .orderBy(col(t).asc, col(m).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedStruct = last(col(p), ignoreNulls = true).over(w)
    val carried: Seq[Column] =
      rightVals.map(c => carriedStruct.getField(c).as(s"asof_$c"))
    l.unionByName(r)
      .select(Seq(col(on), col(m)) ++ leftCols.filterNot(_ == on).map(col)
        ++ carried: _*)
      .where(col(m) === 1) // keep only left rows, now carrying asof_* values
      .drop(m)
  }

  /** As-of join with a MAX-STALENESS tolerance (the feature-store /
    * pandas `merge_asof(tolerance=…)` semantics): like [[asofJoin]], but a
    * match older than `toleranceUs` microseconds is rejected — its
    * payload columns are nulled and the row reports `asof_matched =
    * false`, `asof_lag_us = -1` (no-NULL sentinel). A stale feature is
    * treated as NO feature, which is what leak-aware training joins
    * want: crediting a conversion to a week-old click is attribution
    * noise, and serving a model a stale feature silently shifts its
    * input distribution.
    *
    * Same one-shuffle union-and-scan cost profile as [[asofJoin]] — the
    * tolerance is a post-window per-row predicate on the carried match
    * time, never a second join. Time columns must cast to timestamp;
    * the lag is computed in exact epoch-micros (int64).
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, on: String,
                        leftTime: String, rightTime: String,
                        rightVals: Seq[String],
                        toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs: $toleranceUs")
    // time columns may be timestamps (converted to epoch-micros) or
    // already-numeric micros (used as-is) — mixed is fine
    def toUs(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast("timestamp"))
        case _ => c.cast("long")
      }
    val rt = "__asof_rt"
    val joined = asofJoin(left, right.withColumn(rt, col(rightTime)), on,
      leftTime, rightTime, rightVals :+ rt)
    val lagUs = toUs(col(leftTime), left.schema(leftTime).dataType) -
      toUs(col(s"asof_$rt"), right.schema(rightTime).dataType)
    val ok = col(s"asof_$rt").isNotNull && lagUs <= toleranceUs
    val vals = rightVals.map(c =>
      when(ok, col(s"asof_$c"))
        .otherwise(lit(null).cast(right.schema(c).dataType)).as(s"asof_$c"))
    val keep = joined.columns
      .filterNot(c => c == s"asof_$rt" || rightVals.exists(v => c == s"asof_$v"))
      .map(col).toSeq
    joined.select(keep ++ vals :+ ok.as("asof_matched") :+
      when(ok, lagUs).otherwise(lit(-1L)).as("asof_lag_us"): _*)
  }

  /** NEAREST-match as-of join (pandas `merge_asof(direction='nearest')`):
    * for every left row, the right row minimizing |Δt| in EITHER
    * direction within the key group; exact ties go to the backward
    * (earlier-or-equal) match. The sensor-alignment semantics — a reading
    * 1 s in the future beats one 5 min in the past, where [[asofJoin]]
    * would silently take the stale one.
    *
    * Same union-and-scan discipline, ONE hash exchange: the backward leg
    * is [[asofJoin]]'s running `last(payload, ignoreNulls)`; the forward
    * leg is its mirror — `first(payload, ignoreNulls)` over
    * (currentRow, unboundedFollowing) with the tie marker DESCENDING, so
    * an exactly-simultaneous right row is visible to BOTH legs and the
    * Δt=0 tie resolves backward. Two sorts share the one exchange.
    *
    * Contract: time columns are numeric epoch-micros (int64); (key, time)
    * unique on the right. Output: left columns + `nearest_<val>` (null
    * when the key group has no right rows), `nearest_dt_us` (−1 sentinel
    * when unmatched), `nearest_dir` ∈ {backward, forward, none}.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, on: String,
                      leftTime: String, rightTime: String,
                      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val t = "__asof_t"
    val m = "__asof_m"
    val p = "__asof_p"
    val fields = ("rt" -> right.schema(rightTime).dataType) +:
      rightVals.map(c => c -> right.schema(c).dataType)
    val pType = org.apache.spark.sql.types.StructType(fields.map {
      case (n, dt) => org.apache.spark.sql.types.StructField(n, dt)
    })
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(m, lit(1))
      .select(Seq(col(on), col(t), col(m)) ++
        leftCols.filterNot(_ == on).map(col) :+
        lit(null).cast(pType).as(p): _*)
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(m, lit(0))
      .select(Seq(col(on), col(t), col(m)) ++
        leftCols.filterNot(_ == on)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("rt") +: rightVals.map(col): _*).as(p): _*)
    val wb = Window.partitionBy(col(on))
      .orderBy(col(t).asc, col(m).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(on))
      .orderBy(col(t).asc, col(m).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pb = last(col(p), ignoreNulls = true).over(wb)
    val pf = first(col(p), ignoreNulls = true).over(wf)
    val u = l.unionByName(r)
      .select(Seq(col(on), col(m), col(t)) ++
        leftCols.filterNot(_ == on).map(col) :+
        pb.as("__pb") :+ pf.as("__pf"): _*)
      .where(col(m) === 1)
    val dtb = col(t).cast("long") - col("__pb").getField("rt").cast("long")
    val dtf = col("__pf").getField("rt").cast("long") - col(t).cast("long")
    val dir = when(col("__pb").isNull && col("__pf").isNull, lit("none"))
      .when(col("__pf").isNull ||
        (col("__pb").isNotNull && dtb <= dtf), lit("backward"))
      .otherwise(lit("forward"))
    val chosen = when(dir === "backward", col("__pb"))
      .when(dir === "forward", col("__pf"))
    u.select(Seq(col(on)) ++ leftCols.filterNot(_ == on).map(col) ++
      rightVals.map(c => chosen.getField(c).as(s"nearest_$c")) :+
      when(dir === "none", lit(-1L))
        .when(dir === "backward", dtb).otherwise(dtf).as("nearest_dt_us") :+
      dir.as("nearest_dir"): _*)
  }
}
