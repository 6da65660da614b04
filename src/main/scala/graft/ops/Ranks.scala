package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without a single-partition funnel — the
  * distributed order-statistics kernel behind the robust-stats queries
  * (trimmed/winsorized means).
  *
  * The naive form is a constant-key window: every row through one task's
  * sort — correct, and exactly the straggler a 100× scale-up turns into
  * the job. Instead: range-repartition on the sort key, rank locally per
  * range partition, then add per-range prefix-count offsets (one
  * ≤ numParts-row bounded driver collect). Each task sorts only its own
  * range slice; the collect is partition-count-scale, never data-scale.
  * The persist barrier pins partition ids so the count pass and the rank
  * pass read identical slices (AQE may coalesce adjacent ranges — the
  * merged ids still order by range, so prefix offsets stay exact).
  */
object Ranks {

  /** `df` extended with `r` (1-based exact global rank by (sortCol,
    * tieCol) — tieCol must make the order total) and `n` (total rows).
    * Output columns: sortCol aliased `x`, tieCol aliased `tie` (carried
    * through so callers can join rankings back to rows), rank `r`,
    * total `n`.
    */
  def globalRank(df: DataFrame, sortCol: Column, tieCol: Column,
                 numParts: Int = 32): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val parted = df.select(sortCol.as("x"), tieCol.as("tie"))
      .repartitionByRange(numParts, col("x"), col("tie"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnts = parted.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .orderBy(col("pid"))
      .collect().map(r => (r.getInt(0), r.getLong(1))) // ≤ numParts rows
    val total = cnts.map(_._2).sum
    val offsets: Map[Int, Long] = // pid → rows in all lower ranges
      cnts.map(_._1).zip(cnts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    parted.select(col("x"), col("tie"),
      (row_number().over(W.partitionBy(col("pid"))
        .orderBy(col("x"), col("tie"))).cast("long")
        + element_at(typedlit(offsets), col("pid"))).as("r"),
      lit(total).as("n"))
  }

  /** Per-GROUP sibling of [[globalRank]]: exact 1-based rank of every row
    * WITHIN its group by (sortCol, tieCol), plus the group size `n` —
    * without giving any single task a whole group's sort (the
    * `Window.partitionBy(grp)` form funnels each group through one task:
    * with few heavy groups that is the same 100×-scale cliff as the
    * constant-key window, and the same cliff as the exact
    * percentile/median builtins, whose aggregation state is a value→count
    * map per group — VERDICT r15 #3).
    *
    * Discipline: range-repartition on (grp, sort, tie) so each group
    * spans a contiguous run of range partitions; rank locally per
    * (partition, group); add per-(partition, group) prefix-count offsets.
    * The offset relation is ≤ numParts × |groups| rows, built
    * DISTRIBUTED (a tiny window over the per-slice counts) and broadcast
    * back — no driver collect at all. Output: `g`, `x`, `tie`, rank `r`,
    * group size `n`.
    */
  def groupedRank(df: DataFrame, grpCol: Column, sortCol: Column,
                  tieCol: Column, numParts: Int = 32): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val parted = df.select(grpCol.as("g"), sortCol.as("x"), tieCol.as("tie"))
      .repartitionByRange(numParts, col("g"), col("x"), col("tie"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnts = parted.groupBy(col("pid"), col("g")).agg(count(lit(1)).as("c"))
    val offs = cnts.select(col("pid"), col("g"),
      coalesce(sum(col("c")).over(W.partitionBy(col("g"))
        .orderBy(col("pid"))
        .rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("off"),
      sum(col("c")).over(W.partitionBy(col("g"))).as("n"))
    parted.join(broadcast(offs), Seq("pid", "g"))
      .select(col("g"), col("x"), col("tie"),
        (row_number().over(W.partitionBy(col("pid"), col("g"))
          .orderBy(col("x"), col("tie"))).cast("long") + col("off")).as("r"),
        col("n"))
  }

  /** The WEIGHTED sibling: exact global running weight in (sortCol,
    * tieCol) order — `(x, w, cumw, totw)` with `cumw` the INCLUSIVE
    * decimal-exact prefix sum of `weightCol`. Same range-partitioned
    * discipline (per-range local window + per-range weight-sum offsets,
    * one bounded driver collect of ≤ numParts decimals); the kernel
    * behind exact weighted quantiles at scale, where a constant-key
    * running-sum window would funnel every row through one task.
    */
  def globalCumWeight(df: DataFrame, sortCol: Column, tieCol: Column,
                      weightCol: Column, numParts: Int = 32): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(30,10)"
    val parted = df.select(sortCol.as("x"), tieCol.as("tie"),
        weightCol.cast(dec).as("w"))
      .repartitionByRange(numParts, col("x"), col("tie"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = parted.groupBy(col("pid"))
      .agg(sum(col("w")).as("sw"))
      .orderBy(col("pid"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1))) // ≤ numParts rows
    val totw = sums.map(r => BigDecimal(r._2)).sum
    val offsets: Map[Int, java.math.BigDecimal] = // pid → weight below
      sums.map(_._1)
        .zip(sums.map(r => BigDecimal(r._2)).scanLeft(BigDecimal(0))(_ + _)
          .init.map(_.bigDecimal))
        .toMap
    val w = W.partitionBy(col("pid")).orderBy(col("x"), col("tie"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    parted.select(col("x"), col("w"),
      // offsets carry ≤ 10-dp values: the cast back to the shared scale
      // is exact, and keeps the add inside one decimal precision class
      (sum(col("w")).over(w)
        + element_at(typedlit(offsets), col("pid")).cast(dec)).as("cumw"),
      lit(totw.bigDecimal).cast(dec).as("totw"))
  }
}
