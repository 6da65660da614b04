package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiler: the per-column statistics a cost-based
  * optimizer (and any dataset datasheet) feeds on — row count, null count,
  * distinct count, min/max — computed in ONE aggregation pass and unpivoted
  * to a row per column (SURVEY §2.2 "Aggregations"; the engine-side twin of
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`).
  *
  * Plan: a single global `agg` carrying every column's non-distinct stats
  * side by side (one scan, whole-stage codegen, no Expand), then a narrow
  * explode-of-structs unpivot. Exact ndv runs as one single-distinct
  * aggregate PER COLUMN — each scan pruned to that one parquet column —
  * unioned into an 8-row (col_name, ndv) relation and equi-joined back on
  * col_name. Measured at sf0.1: the folded multi-distinct form plans as
  * Catalyst's Expand, which replicates every row (columns+1)× and drags
  * ALL 25 aggregate expressions over the expanded set (~18 s); the
  * per-column form is ~3 s, and each leg is the plan `ANALYZE` itself
  * would run. With `exactNdv = false` every ndv becomes
  * `approx_count_distinct` (HLL) inline in the one stats pass — single
  * scan, mergeable partials, the form a 100 TB profile runs. The gate
  * query keeps exact ndv (the oracle is exact); the flag is the
  * documented scale swap.
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
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        all.flatMap(c => Seq(count(col(c)).as(s"__cnt_$c")) ++
          (if (exactNdv) Nil
           else Seq(approx_count_distinct(col(c)).as(s"__ndv_$c")))) ++
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
        (Seq(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_null")) ++
          (if (exactNdv) Nil else Seq(col(s"__ndv_$c").as("ndv"))) ++
          Seq(
            (if (isStr) lit(null).cast("double") else col(s"__min_$c"))
              .as("min_num"),
            (if (isStr) lit(null).cast("double") else col(s"__max_$c"))
              .as("max_num"),
            (if (isStr) col(s"__min_$c") else lit(null).cast("string"))
              .as("min_str"),
            (if (isStr) col(s"__max_$c") else lit(null).cast("string"))
              .as("max_str"))): _*)
    }
    val base = one.select(explode(array(rows: _*)).as("__s")).select(col("__s.*"))
    if (!exactNdv)
      base.select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    else {
      val ndvs = all.map(c =>
          df.agg(count_distinct(col(c)).as("ndv"))
            .select(lit(c).as("col_name"), col("ndv")))
        .reduce(_ unionByName _)
      base.join(ndvs, Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
  }

  /** Equi-DEPTH histogram — the other half of the CBO histogram pair
    * (equi-width lives in the gated `q_histogram`): per group, `buckets`
    * quantile buckets of (approximately) equal row count via `ntile` over
    * the total order (`valCol`, `idCol`) — the unique id tiebreak makes
    * bucket membership deterministic, and ntile's remainder rule (first
    * buckets get the extra row) is identical in Spark and DuckDB. Output
    * per (group, bucket): row count and the bucket's [lo, hi] value range
    * — exactly the boundary list an optimizer's selectivity estimate
    * reads.
    *
    * Scale: ntile is a per-group window — one hash exchange on the group
    * key and a per-group sort, the same cost as any ranking window. At
    * 100 TB swap the exact ntile for `approx_percentile(valCol, quantiles)`
    * cut points (one mergeable-sketch pass, no per-group sort); the exact
    * form is the gate because the oracle is exact.
    */
  def equiDepthHistogram(df: DataFrame, grpCol: String, valCol: String,
                         idCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets: $buckets")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(grpCol)).orderBy(col(valCol), col(idCol))
    df.withColumn("bucket", ntile(buckets).over(w))
      .groupBy(col(grpCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }
}
