package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over an edge relation — the entity-importance signal a
  * curation stack computes over join-derived graphs (domain links, shared
  * fingerprints, buyer/supplier relations).
  *
  * Engine-portable numeric contract: contribution sums accumulate in
  * DECIMAL (order-independent), every other step is a deterministic IEEE
  * double op — so intermediate ranks are bit-identical across
  * partitionings and engines WITHOUT intermediate rounding, and a DuckDB
  * oracle can replay the iterations as unrolled CTEs. Rounding happens
  * exactly once, on the final output, at 6 decimals: per-iteration
  * round(…, 9) was measurably non-portable (one fixture row landed on a
  * round-half boundary where the two engines' double-rounding
  * implementations disagree by 1 ulp; 6-decimal single-rounding is the
  * precision the other 87 oracles have proven portable).
  */
object Graph {

  private val Dec = "decimal(28,12)"

  /** PageRank with a FIXED iteration count over `(src, dst)` edges:
    * rank⁽ⁱ⁺¹⁾(v) = (1−d)/N + d·Σ_{u→v} rank⁽ⁱ⁾(u)/outdeg(u), rank⁽⁰⁾ =
    * 1/N. Dangling-node mass is dropped, not redistributed (ranks then
    * sum to < 1 — standard for the bounded-iteration form; symmetric
    * edge sets have no dangling nodes anyway).
    *
    * Scale posture: each iteration is ONE keyed join (ranks×edges on src
    * — ranks is node-scale, edges edge-scale) plus one hash aggregate on
    * dst and one left join back to the node set; iteration count is a
    * constant, so the lineage is a fixed-depth declarative plan Catalyst
    * sees whole (no driver loop state). The edge relation is partitioned
    * by dst ONCE before the loop: the per-iteration rank join broadcasts
    * (node-scale build side) and so preserves that partitioning, which
    * the contribution aggregate then reuses — the edge-scale shuffle
    * happens once, not once per iteration. The node count is the single
    * driver-side scalar (one count job).
    */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters: $iters")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
      .unionByName(e.select(col("dst").as("node")).distinct()).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // the one driver scalar; also materializes both
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var rank = nodes.withColumn("rank", lit(1.0) / n)
    for (_ <- 1 to iters) {
      // rank and deg are node-scale — broadcast them so the edge relation
      // streams in place (preserving its dst partitioning); drop the
      // hints for graphs whose node set outgrows executor memory and let
      // AQE pick the join sides
      val contrib = e
        .join(broadcast(rank.withColumnRenamed("node", "src")), Seq("src"))
        .join(broadcast(deg), Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast(Dec).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).cast("double").as("in_sum"))
      rank = nodes.join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit((1 - d) / n) + lit(d) * coalesce(col("in_sum"), lit(0.0)))
            .as("rank"))
    }
    rank.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** Per-node triangle participation counts over an undirected edge set
    * (any orientation, duplicates fine — canonicalized to distinct
    * `a < b` internally). Compact-forward with DEGREE ordering (Ortmann &
    * Brandes 2014 survey; public algorithm): orient every edge from the
    * (degree, id)-smaller endpoint to the larger, enumerate wedges at
    * their lowest-order corner, close each with a hash probe back into
    * the directed edge set. Each triangle is found exactly once at its
    * minimum-order corner, then credited to all three corners.
    *
    * Scale posture: both steps are keyed hash joins, and degree ordering
    * is what makes the wedge relation bounded — Σ outdeg⁺² with
    * outdeg⁺ = O(√|E|) on any graph (arboricity bound), where naive ID
    * orientation lets one dense hub emit deg² wedges. Measured on the
    * part co-purchase graph at sf0.1 the unordered form was the
    * single slowest query in the suite (25 s); the output is
    * orientation-invariant, so the oracle needs no mirror of the
    * internal order. Nodes in no triangle are absent from the result
    * (COALESCE at the call site if zeros are wanted).
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") < col("b")) // drops self-loops
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // total order: (deg, id); since a < b, a wins ties
    val aFirst = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .withColumn("a_first", col("da") <= col("db")) // (deg,id): a<b breaks deg ties
    val dir = aFirst.select(
        when(col("a_first"), col("a")).otherwise(col("b")).as("u"),
        when(col("a_first"), col("b")).otherwise(col("a")).as("v"),
        when(col("a_first"), col("db")).otherwise(col("da")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at the lowest-order corner u, legs ordered v < w in (deg, id)
    val wedges = dir.as("e1")
      .join(dir.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("cu"), col("e1.v").as("x"), col("e2.v").as("y"))
    // the closing edge is directed x→y exactly because ord(x) < ord(y)
    val tri = wedges.join(
        dir.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("cu").as("a"), col("x").as("b"), col("y").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
  }
}
