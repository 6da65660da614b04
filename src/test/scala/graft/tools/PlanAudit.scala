package graft.tools

import graft.{Sessions, SparkEntry}

/** Test-scope plan dumper: prints the formatted physical plan of selected
  * queries for the scale-posture audit (pushdown, pruning, broadcast
  * choice, codegen spans). Run:
  *   sbt 'Test/runMain graft.tools.PlanAudit <sfDir> <query...>'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("wc_words", "q_join_pricing", "q_join_asof", "q_topk_orders")
    val spark = Sessions.local("plan-audit")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
