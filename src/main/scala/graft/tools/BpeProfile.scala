package graft.tools

/** One-off cache-reuse probe for the BPE bench queries (bench r9): runs
  * q_bpe_apply / q_bpe_train twice like Bench's warm+timed protocol and
  * prints both timings plus whether the second run's plan picked up the
  * warm run's InMemoryRelations. Diagnosis tool, not gated surface.
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_bpe_apply", "q_bpe_train", "q_semdedup")
    val spark = graft.Sessions.local("bpe-profile")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      val w = once(name); val t = once(name)
      val qe = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
      val imr = qe.optimizedPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }.size
      println(f"[profile] $name%-14s warm $w%.2f timed $t%.2f cachedLeaves $imr")
      if (name == "q_bpe_apply")
        println(qe.optimizedPlan.treeString.linesIterator
          .take(40).mkString("\n"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
