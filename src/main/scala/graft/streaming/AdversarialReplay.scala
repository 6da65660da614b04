package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial streaming replay (VERDICT r17 #7): the STREAM_EQ shapes
  * replay clean ordered slices under a beyond-span watermark, so late-drop
  * semantics were only ever exercised by the directed unit specs. This
  * module replays the SAME fixture under a TIGHT watermark with
  * hash-shuffled batch boundaries — batches are deliberately NOT
  * time-ordered, so genuinely-late rows (beyond the watermark at their
  * arrival batch) occur by construction — and predicts the stream's exact
  * output from the batch frame by simulating Spark's watermark
  * progression: stream == batch-minus-EXPECTED-drops, with the drop
  * accounting explicit in the artifact.
  *
  * Watermark mechanics replicated here (pinned EMPIRICALLY by
  * `AdversarialReplaySpec` against boundary-crafted data — every rule
  * below was measured on this Spark build, including one the docs don't
  * state — then asserted per-round at fixture scale by `tools.StreamEq`):
  *  - cum(i) = max_j≤i(floor(maxTsMicros_j / 1000) − delayMs) · 1000,
  *    monotone, floored at 0 — the watermark derived from data through
  *    batch i (Spark's EventTimeWatermarkExec collects per-batch max
  *    event time in floor-ms); the progress report for batch i shows
  *    cum(i−1);
  *  - MEASURED LAG: the watermark the stateful operators actually APPLY
  *    in batch i is cum(i−2), one batch behind the reported value — a
  *    5-batch probe showed batch 1 keeping a row 20 min behind its
  *    reported 08:30 watermark (numRowsDroppedByWatermark = 0) while
  *    batch 4 dropped rows against exactly the PREVIOUS batch's report.
  *    The update computed at the end of batch i−1 takes effect in batch
  *    i+1's predicates;
  *  - every arriving row advances the batch's max event time, including
  *    rows the stateful operator then drops as late;
  *  - windowed aggregation (append mode): an input row is dropped iff
  *    its window END ≤ the batch's applied watermark; the final table
  *    contains exactly the windows with end ≤ the FINAL watermark
  *    cum(n−1) — Trigger.AvailableNow's closing no-data micro-batches
  *    run until the watermark stabilizes, flushing everything it
  *    finalizes; later windows are withheld (never emitted);
  *  - streaming dropDuplicates on a non-event-time key: an input row is
  *    dropped iff its event time ≤ the batch's applied watermark;
  *    surviving first-arrivals emit, later arrivals of a seen key are
  *    suppressed (the key carries no event time, so state is never
  *    watermark-evicted and a key can never re-emit).
  *
  * Scale posture: the simulator is pure DataFrame algebra over the batch
  * frame joined to an n_batches-row watermark table (broadcast); the only
  * driver-side materialization is that per-batch max-ts table — bounded
  * by the micro-batch count, never the data.
  */
object AdversarialReplay {

  /** Deterministic shuffled batch assignment: batch_id from a hash of
    * (event_id, event-time micros) — adjacent event times scatter across
    * batches, so every batch mixes old and new rows and late arrivals
    * are guaranteed under any tight watermark. The column RIDES INTO the
    * written files so the simulator reads the exact assignment back
    * instead of re-deriving it.
    */
  def withBatchId(df: DataFrame, tsCol: String, idCol: String,
                  nBatches: Int): DataFrame =
    df.withColumn("batch_id",
      pmod(hash(col(idCol), unix_micros(col(tsCol))), lit(nBatches)))

  /** Write one parquet file per batch_id into `dir`, file names AND
    * modification times both increasing in batch order — the file stream
    * source processes oldest-first, so `maxFilesPerTrigger=1` replays
    * batch i as micro-batch i.
    */
  def writeBatches(spark: SparkSession, df: DataFrame, dir: String,
                   nBatches: Int): Unit = {
    val base = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(base)
    base.mkdirs()
    val t0 = System.currentTimeMillis() - (nBatches + 2) * 2000L
    (0 until nBatches).foreach { i =>
      val tmp = new java.io.File(base, s"_tmp_b$i")
      df.where(col("batch_id") === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written for batch $i"))
      val dest = new java.io.File(base, f"b$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      require(dest.setLastModified(t0 + i * 2000L),
        s"cannot stamp mtime on $dest")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  /** Millis delay of a `withWatermark` duration string like "3 hours" /
    * "30 minutes" / "45 seconds" (the subset the shapes use). */
  def delayMs(lateness: String): Long = {
    val m = "^(\\d+)\\s+(hour|minute|second)s?$".r
      .findFirstMatchIn(lateness.trim)
      .getOrElse(sys.error(s"unsupported lateness: $lateness"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "hour" => n * 3600000L
      case "minute" => n * 60000L
      case "second" => n * 1000L
    }
  }

  /** The watermark (MICROS) each batch's stateful operators APPLY —
    * index i = cum(i−2), the measured one-batch lag behind the progress
    * report (class doc) — plus the final watermark cum(n−1) at index n.
    * One tiny driver-side collect: n rows.
    */
  def appliedWatermarksMicros(df: DataFrame, tsCol: String, nBatches: Int,
                              lateness: String): IndexedSeq[Long] = {
    val delay = delayMs(lateness)
    val maxMs: Map[Int, Long] = df
      .groupBy(col("batch_id"))
      .agg(max(floor(unix_micros(col(tsCol)) / 1000L)).as("max_ms"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // cum(i) = watermark derived from data through batch i
    val cum = (0 until nBatches).scanLeft(0L) { (wm, i) =>
      maxMs.get(i) match {
        case None => wm // empty batch advances nothing
        case Some(ms) => math.max(wm, math.max(0L, ms - delay) * 1000L)
      }
    }.drop(1).toIndexedSeq // drop the scan seed: cum(i) at index i
    // applied(i) = cum(i-2): batch 0 and 1 run at watermark 0
    val applied = (0 until nBatches).map(i =>
      if (i < 2) 0L else cum(i - 2))
    applied :+ cum(nBatches - 1)
  }

  private def wmTable(spark: SparkSession,
                      wms: IndexedSeq[Long]): DataFrame = {
    import spark.implicits._
    wms.dropRight(1).zipWithIndex
      .map { case (wm, i) => (i, wm) }.toDF("batch_id", "wm_micros")
  }

  /** Expected APPEND-mode output of
    * [[EventsStream.hourlyTypeCounts]] under the tight watermark —
    * (expected frame, rows dropped as late, windows withheld as
    * unfinalized). The caller asserts the stream's memory-sink output
    * equals the frame AND that both drop counts are positive (the shape
    * must actually be adversarial).
    */
  def expectedHourlyTypeCounts(spark: SparkSession, batchDf: DataFrame,
                               lateness: String, nBatches: Int)
      : (DataFrame, Long, Long) = {
    val wms = appliedWatermarksMicros(batchDf, "ts", nBatches, lateness)
    val wmFinal = wms.last
    val winEnd = unix_micros(window(col("ts"), "1 hour").getField("end"))
    val joined = batchDf.join(
      broadcast(wmTable(spark, wms)), Seq("batch_id"))
    val survivors = joined.where(!(winEnd <= col("wm_micros")))
    val lateDropped = joined.count() - survivors.count()
    val allWindows = EventsStream.hourlyTypeCounts(
      survivors.drop("batch_id", "wm_micros"), lateness)
    val emitted = allWindows.where(
      unix_micros(col("hour")) + 3600L * 1000000L <= wmFinal)
    val withheld = allWindows.count() - emitted.count()
    (emitted, lateDropped, withheld)
  }

  /** Expected APPEND-mode emissions of [[EventsStream.dedupedEvents]]
    * under the tight watermark, as the distinct emitted key set —
    * (expected event_id frame, rows dropped as late, non-late duplicate
    * arrivals suppressed). Keys carry no event time, so state never
    * evicts and each key emits at most once (class doc); the emitted-set
    * compare is exact while the representative ROW per key stays
    * nondeterministic (the firstSeenDocs precedent).
    */
  def expectedDedupKeys(spark: SparkSession, batchDf: DataFrame,
                        lateness: String, nBatches: Int)
      : (DataFrame, Long, Long) = {
    val wms = appliedWatermarksMicros(batchDf, "ts", nBatches, lateness)
    val joined = batchDf.join(
      broadcast(wmTable(spark, wms)), Seq("batch_id"))
    val nonLate = joined.where(!(unix_micros(col("ts")) <= col("wm_micros")))
    val lateDropped = joined.count() - nonLate.count()
    val keys = nonLate.select(col("event_id")).distinct()
    val suppressed = nonLate.count() - keys.count()
    (keys, lateDropped, suppressed)
  }
}
