package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan-audit helper: print `explain("formatted")` for named gated
  * queries (all of them if none named) against a fixture dir — the
  * "is this the plan you'd want at 100 TB" loop without editing specs.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> [q_a,q_b,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = Sessions.local("graft-explain")
    try names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n (see SparkEntry.queries)"))
      println(s"\n════ $n ════")
      fn(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
