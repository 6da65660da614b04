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
    * Output columns: sortCol aliased `x`, rank `r`, total `n`.
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
    parted.select(col("x"),
      (row_number().over(W.partitionBy(col("pid"))
        .orderBy(col("x"), col("tie"))).cast("long")
        + element_at(typedlit(offsets), col("pid"))).as("r"),
      lit(total).as("n"))
  }
}
