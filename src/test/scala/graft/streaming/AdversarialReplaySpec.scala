package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins [[AdversarialReplay]]'s watermark-progression model against the
  * REAL streaming engine on boundary-crafted data (VERDICT r17 #7): every
  * convention the simulator encodes — the measured one-batch application
  * lag, floor-ms watermark arithmetic, drop-iff-window-end ≤ wm for
  * aggregation, drop-iff-ts ≤ wm for dedup, emit-iff-window-end ≤ final
  * wm — has a row sitting exactly ON the boundary here, so a drifted
  * convention fails loudly instead of passing by luck. StreamEq then
  * replays the same check over the driver fixture per round.
  *
  * Fixture design (delay = 2 h):
  *   cum(0) = 13:00 − 2 h = 11:00      (batch 0 max)
  *   cum(1) = 14:00 − 2 h = 12:00
  *   applied wm: b0 = 0, b1 = 0 (LAG — the engine's own progress report
  *   for b1 says 11:00), b2 = cum(0) = 11:00, b3 = cum(1) = 12:00,
  *   b4 = cum(2) = 12:00; final = cum(4) = 12:00.
  */
class AdversarialReplaySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val crafted: DataFrame = Seq(
    // batch 0
    (1L, ts("2026-01-01 13:00:00"), 0), //                       sets cum(0)=11:00
    (100L, ts("2026-01-01 10:00:00"), 0), //                     dup key, 1st copy
    // batch 1 — applied wm 0 despite reported 11:00
    (2L, ts("2026-01-01 14:00:00"), 1), //                       sets cum(1)=12:00
    (3L, ts("2026-01-01 08:30:00"), 1), // LAG PROBE: 2.5 h behind the
    //   reported watermark, yet kept by BOTH operators — under a lagless
    //   model its [08,09) window would drop and the compare would fail
    // batch 2 — applied wm 11:00 exactly
    (4L, ts("2026-01-01 10:59:59"), 2), // agg boundary: window end == wm → drop
    (5L, ts("2026-01-01 11:00:00"), 2), // dedup boundary: ts == wm → drop;
    //   agg keeps it ([11,12) end 12:00 > wm — drop is window-end-based)
    (6L, ts("2026-01-01 09:40:00"), 2), // strictly late: both operators drop
    // batch 3 — applied wm 12:00
    (7L, ts("2026-01-01 12:30:00"), 3), //                       fresh
    (8L, ts("2026-01-01 12:00:00"), 3), // dedup boundary at 12:00 → drop
    (101L, ts("2026-01-01 07:10:00"), 3), // late FIRST arrival of 101: dropped —
    //   must not poison dedup state
    // batch 4 — applied wm 12:00
    (101L, ts("2026-01-01 13:30:00"), 4), // fresh 2nd copy of 101 → EMITS
    (100L, ts("2026-01-01 12:40:00"), 4) //  non-late dup of 100 → suppressed
  ).map { case (id, t, b) => (id, t, 1L, "click", 1.0, b) }
    .toDF("event_id", "ts", "user_id", "event_type", "value", "batch_id")

  private val NBatches = 5
  private val Late = "2 hours"

  private lazy val replayDir: String = {
    val dir = tempDir("advReplay").resolve("batches").toString
    AdversarialReplay.writeBatches(spark, crafted, dir, NBatches)
    dir
  }

  private def streamDf: DataFrame = {
    val schema = spark.read.parquet(replayDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(replayDir)
  }

  private def runStream(df: DataFrame, mode: String, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in time")
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq
      .sorted(Ordering.Implicits.seqOrdering[Seq, String])

  test("applied-watermark model: per-batch lag and final value") {
    val wms = AdversarialReplay.appliedWatermarksMicros(
      crafted, "ts", NBatches, Late)
    def micros(s: String) = ts(s).getTime * 1000L
    assert(wms === IndexedSeq(0L, 0L,
      micros("2026-01-01 11:00:00"),
      micros("2026-01-01 12:00:00"),
      micros("2026-01-01 12:00:00"),
      micros("2026-01-01 12:00:00")))
  }

  test("append-mode windowed agg under a tight watermark == simulated batch-minus-drops") {
    val got = runStream(EventsStream.hourlyTypeCounts(streamDf, Late),
      "append", "adv_hourly")
    val (expected, lateDropped, withheld) =
      AdversarialReplay.expectedHourlyTypeCounts(spark, crafted, Late, NBatches)
    assert(canon(got) === canon(expected))
    // the shape is genuinely adversarial: real late drops AND withheld
    // unfinalized windows
    assert(lateDropped === 3, s"rows 4, 6, 101a drop; got $lateDropped")
    assert(withheld === 3, s"[12,13) [13,14) [14,15) withheld; got $withheld")
    // convention probes, asserted by name so a drifted simulator can't
    // pass on aggregate luck:
    val hourCounts = got.select(date_format(col("hour"), "HH").cast("int"),
        col("cnt")).as[(Int, Long)].collect().toMap
    assert(hourCounts.get(8) === Some(1L),
      "lag probe: row 3's [08,09) window survives b1 despite the reported watermark")
    assert(hourCounts.get(10) === Some(1L),
      "row 4 (window end == applied wm) drops — <= boundary — leaving only row 100")
    assert(hourCounts.get(11) === Some(1L),
      "row 5 survives the agg (ts <= wm but window end > wm) and [11,12) end == final wm emits")
    assert(!hourCounts.contains(12) && !hourCounts.contains(13),
      "windows past the final watermark are withheld")
  }

  test("streaming dedup under a tight watermark == simulated non-late first arrivals") {
    val got = runStream(EventsStream.dedupedEvents(streamDf, Late),
      "append", "adv_dedup")
    val (expectedKeys, lateDropped, suppressed) =
      AdversarialReplay.expectedDedupKeys(spark, crafted, Late, NBatches)
    // emitted key set matches, and each key emits exactly once
    assert(canon(got.select("event_id")) === canon(expectedKeys))
    assert(got.count() === got.select("event_id").distinct().count())
    assert(lateDropped === 5, s"rows 4, 5, 6, 8, 101a; got $lateDropped")
    assert(suppressed === 1, s"key 100's b4 duplicate; got $suppressed")
    val keys = got.select("event_id").as[Long].collect().toSet
    assert(keys === Set(1L, 2L, 3L, 7L, 100L, 101L))
    assert(keys.contains(3L), "lag probe: b1 runs at watermark 0")
    assert(!keys.contains(5L) && !keys.contains(8L),
      "ts == applied wm drops (<= boundary)")
    assert(keys.contains(101L),
      "late first arrival must not poison state: 101 re-emits via its fresh copy")
  }
}
