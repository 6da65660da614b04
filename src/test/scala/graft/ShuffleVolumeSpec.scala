package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Measured scale posture: the word-count pipeline's shuffle volume scales
  * with DISTINCT keys, not input bytes (map-side partial aggregation) —
  * the property that makes the plan survive a 100× input blow-up
  * (WordCount scaladoc's central claim, verified with real task metrics).
  */
class ShuffleVolumeSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleBytesOf(action: => Unit): Long = {
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // listener events are async and the private listenerBus.waitUntilEmpty
      // isn't accessible: poll until the byte count is stable (bounded)
      var prev = -1L
      var tries = 0
      while (bytes.get() != prev && tries < 50) {
        prev = bytes.get()
        Thread.sleep(100)
        tries += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  test("8x the input bytes, same distinct words => shuffle stays ~flat") {
    val vocab = Vector.tabulate(200)(i => s"word$i")
    val rnd = new scala.util.Random(3)
    val lines = Seq.fill(2000)(
      Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    // materialize both corpora as 8 parquet files OUTSIDE the measurement:
    // both runs then have the same map-partition count, so the only
    // measured exchange is the aggregation shuffle (a repartition inside
    // the measured job would itself shuffle proportionally to rows)
    val dirs = tempDir("shufvol")
    lines.toDF("text").repartition(8)
      .write.parquet(dirs.resolve("small").toString)
    Seq.fill(8)(lines).flatten.toDF("text").repartition(8)
      .write.parquet(dirs.resolve("big").toString)
    val small = spark.read.parquet(dirs.resolve("small").toString)
    val big = spark.read.parquet(dirs.resolve("big").toString)

    def runWc(df: org.apache.spark.sql.DataFrame): Long =
      shuffleBytesOf {
        graft.wc.WordCount.fromText(df, "text")
          .write.mode("overwrite").format("noop").save()
      }

    runWc(small) // warm-up: JIT + codegen outside the measurement
    val smallBytes = runWc(small)
    val bigBytes = runWc(big)
    assert(smallBytes > 0L)
    // 8x rows but identical key set: partial aggregation must absorb the
    // blow-up. Allow 2x headroom for partition-count effects — the point
    // is it's nowhere near 8x.
    assert(bigBytes < smallBytes * 2,
      s"shuffle grew with input bytes: small=$smallBytes big=$bigBytes")
    // sanity: the big corpus really is 8x the work
    val cnt = graft.wc.WordCount.fromText(big, "text")
      .agg(sum("cnt")).as[Long].head()
    assert(cnt === 8L * 2000 * 10)
  }
}
