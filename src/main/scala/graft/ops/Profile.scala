package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiler: the per-column statistics a cost-based
  * optimizer (and any dataset datasheet) feeds on — row count, null count,
  * distinct count, min/max — computed in ONE aggregation pass and unpivoted
  * to a row per column (SURVEY §2.2 "Aggregations"; the engine-side twin of
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`).
  *
  * Plan: a single global `agg` carrying every column's stats side by side
  * (one scan), then a narrow explode-of-structs unpivot. With `exactNdv`
  * the multi-column `count_distinct` plans as Catalyst's Expand (one
  * replicated row-set per distinct column — the standard exact-multi-ndv
  * plan, ×(columns+1) rows into the partial aggregate); with
  * `exactNdv = false` every ndv becomes `approx_count_distinct` (HLL) and
  * the Expand disappears — ONE pass, mergeable partials, the form a 100 TB
  * profile runs. The gate query keeps exact ndv (the oracle is exact); the
  * flag is the documented scale swap.
  *
  * Typed min/max land in two channels so the output schema is uniform:
  * numerics and timestamps → `min_num`/`max_num` (doubles; timestamps as
  * exact micros/1e6 epoch seconds), strings → `min_str`/`max_str`
  * (UTF8-binary order — Spark and DuckDB agree on default collation).
  */
object Profile {

  def columnStats(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
                  tsCols: Seq[String], exactNdv: Boolean = true): DataFrame = {
    val all = numCols ++ strCols ++ tsCols
    require(all.nonEmpty, "columnStats: no columns")
    require(all.distinct.size == all.size, s"columnStats: duplicate columns in $all")
    def ndv(c: String): Column =
      if (exactNdv) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        all.flatMap(c => Seq(count(col(c)).as(s"__cnt_$c"),
          ndv(c).as(s"__ndv_$c"))) ++
        numCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))) ++
        tsCols.flatMap(c => Seq(
          (unix_micros(min(col(c)).cast("timestamp")) / lit(1000000.0))
            .as(s"__min_$c"),
          (unix_micros(max(col(c)).cast("timestamp")) / lit(1000000.0))
            .as(s"__max_$c"))) ++
        strCols.flatMap(c => Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { c =>
      val isStr = strCols.contains(c)
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        (if (isStr) lit(null).cast("double") else col(s"__min_$c")).as("min_num"),
        (if (isStr) lit(null).cast("double") else col(s"__max_$c")).as("max_num"),
        (if (isStr) col(s"__min_$c") else lit(null).cast("string")).as("min_str"),
        (if (isStr) col(s"__max_$c") else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("__s")).select(col("__s.*"))
  }
}
