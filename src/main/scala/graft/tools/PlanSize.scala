package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan-size census (VERDICT r16 #4): physical node count and plan-string
  * length per gated query, sorted descending — the measurement behind the
  * PlanShapeSpec node-count regression gate (r15 driver logs showed 310k-
  * char plan strings; a lineage deepening should fail a test, not a sweep).
  *
  * Usage: runMain graft.tools.PlanSize [sfDir] [topK]
  * Diagnosis tool, not gated surface.
  */
object PlanSize {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val topK = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = Sessions.local("plan-size")
    // same exclusion as PlanShapeSpec: eagerly-executed iterative queries
    // return a LogicalRDD leaf — nothing to measure, and building them
    // runs the full multi-round job
    val skip = Set("q_dedup_clusters", "q_dedup_cc_hist")
    val sizes = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .map { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        (name, graft.ops.Plans.collectNodes(plan).size, plan.toString.length)
      }
    println(f"${"query"}%-28s nodes  plan_chars")
    sizes.sortBy(-_._2).take(topK).foreach { case (n, c, l) =>
      println(f"$n%-28s $c%5d  $l%10d")
    }
    val total = sizes.map(_._2).sum
    println(s"[plan_size] queries=${sizes.size} total_nodes=$total " +
      s"max=${sizes.maxBy(_._2)} max_chars=${sizes.maxBy(_._3)}")
    spark.stop()
  }
}
