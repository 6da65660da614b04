package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the "minimize shuffles" lever for repeated
  * fact⋈fact joins at scale: both tables bucketed on the join key at write
  * time join WITHOUT any Exchange (bucket layout satisfies the required
  * hash distribution). The spec proves the shuffle disappears from the
  * physical plan and the result stays correct.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no Exchange; plain tables need two") {
    val dir = tempDir("bucketed")
    val left = (0 until 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "lv")
    val right = (0 until 600).map(i => (i.toLong % 50, i * 2L)).toDF("k", "rv")

    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", dir.resolve("l").toString).saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k")
      .option("path", dir.resolve("r").toString).saveAsTable("bkt_right")

    // force the shuffle-join path (the tables are tiny, so the planner
    // would otherwise broadcast and bypass bucketing entirely)
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val bl = spark.table("bkt_left")
      val br = spark.table("bkt_right")
      val joined = bl.join(br, Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("ShuffleExchange") && !plan.contains("hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // correctness: same as joining the original frames
      assert(joined.count() === left.join(right, Seq("k")).count())

      // the un-bucketed form of the same join DOES shuffle both sides
      val plainPlan = left.join(right, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE bkt_left")
      spark.sql("DROP TABLE bkt_right")
    }
  }
}
