package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Timing/shuffle-byte evidence for the bucketed-table write path
  * ([[graft.ops.Layout.writeBucketed]], gated in ShuffleVolumeSpec): run
  * the q_basket_lift-family pair build (lineitem self-join on l_orderkey
  * → pair aggregate) against the plain parquet fixture and against a
  * bucketed copy, and report wall-clock + total shuffle bytes for each.
  * Diagnosis tool, not gated surface; recorded numbers live in
  * BASELINE.md (round 15).
  *
  * Usage: runMain graft.tools.BucketProfile [sfDir] [buckets]
  */
object BucketProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local("bucket-profile")

    val tmp = java.nio.file.Files.createTempDirectory("bktprof")
    tmp.toFile.deleteOnExit()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    spark.sql("DROP TABLE IF EXISTS li_bucketed_prof")
    graft.ops.Layout.writeBucketed(li, "li_bucketed_prof",
      tmp.resolve("li").toString, "l_orderkey", buckets, Seq("l_orderkey"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as("x").join(df.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .agg(count(lit(1)).as("sup"))

    def timed(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain straggler TaskEnd events
      (t, shuffleBytes.get())
    }

    for ((label, src) <- Seq(
        "plain" -> (() => li),
        "bucketed" -> (() => spark.table("li_bucketed_prof")),
        "plain" -> (() => li),
        "bucketed" -> (() => spark.table("li_bucketed_prof")))) {
      timed(pairs(src())) // warm
      val runs = Seq.fill(3)(timed(pairs(src())))
      val med = runs.map(_._1).sorted.apply(1)
      println(f"[bucket] $label%-8s median $med%6.2f s  " +
        f"(samples ${runs.map(r => f"${r._1}%.2f").mkString("[", ", ", "]")}, " +
        f"shuffle ${runs.last._2 / 1024} KiB)")
    }
    spark.sql("DROP TABLE li_bucketed_prof")
    spark.stop()
  }
}
