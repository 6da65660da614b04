package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming operators, tested the way SURVEY §5 prescribes:
  * a streaming query has no DuckDB oracle, so the gate is equivalence with
  * the identical transform applied to the same data as a batch frame.
  * The stream is a real `readStream` file source over parquet written in
  * several files (micro-batches), driven with Trigger.AvailableNow into a
  * memory sink.
  */
class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Small event fixture: 40 events over 3 hours, with planted duplicate
    * event_ids, written as 3 parquet files (3 micro-batch inputs).
    */
  private lazy val eventsDir: String = {
    val dir = tempDir("eventsStream").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (0 until 40).map { i =>
      val ts = new java.sql.Timestamp(base.getTime + i * 5 * 60 * 1000L) // 5-min grid
      val id = if (i % 10 == 9) (i - 1).toLong else i.toLong // every 10th is a dup id
      (id, ts, (i % 3).toLong, if (i % 2 == 0) "click" else "view", i * 1.5)
    }
    // ts stays TIMESTAMP: watermarks reject TIMESTAMP_NTZ event time
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(3)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def batchEvents: DataFrame = spark.read.parquet(eventsDir)

  private def streamEvents: DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(eventsDir)
  }

  /** Run a streaming frame to completion into a memory sink; return the
    * sink contents. `complete` for aggregations, `append` otherwise.
    */
  private def runStream(df: DataFrame, mode: String, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in time")
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
      Ordering.Implicits.seqOrdering[Seq, String])

  test("hourlyTypeCounts: streaming result equals the batch transform") {
    val streamed = runStream(
      EventsStream.hourlyTypeCounts(streamEvents), "complete", "hourly")
    val batch = EventsStream.hourlyTypeCounts(batchEvents)
    assert(canon(streamed) === canon(batch))
    assert(streamed.count() === 4 * 2) // 4 hour-windows × 2 event types
  }

  test("hourlyUniqueUsers: stream == batch; HLL within bound of exact") {
    val streamed = runStream(
      EventsStream.hourlyUniqueUsers(streamEvents), "complete", "uniqUsers")
    val batch = EventsStream.hourlyUniqueUsers(batchEvents)
    // HLL register max is merge-order-independent → bit-equal, not close
    assert(canon(streamed) === canon(batch))
    assert(streamed.count() === 4) // 4 hour-windows
    // fixture has 3 distinct users per hour; default rsd 5% must land
    // exact at this tiny cardinality (sparse-mode HLL is exact there).
    // Compare keyed BY HOUR (ADVICE r07: a Set of counts collapses
    // duplicates and loses the pairing — (3,3,3,4) vs (4,4,4,3) would
    // both reduce to {3,4} and pass)
    val exact = batchEvents.groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select(col("window.start").as("hour"), col("exact"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val approx = streamed.select(col("hour"), col("approx_users"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(approx === exact, s"approx $approx vs exact $exact")
  }

  test("RocksDB state store: same stateful result as the default provider") {
    // the 100 TB posture documented in EventsStream's scaladoc, proven
    // in-environment: the provider is session conf, not plan shape, so a
    // stateful aggregation must produce identical results under
    // RocksDBStateStoreProvider (off-heap state, incremental changelog
    // checkpoints) as under the default in-memory provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocks = runStream(
        EventsStream.hourlyTypeCounts(streamEvents), "complete", "hourlyRocks")
      val batch = EventsStream.hourlyTypeCounts(batchEvents)
      assert(canon(rocks) === canon(batch))
      assert(rocks.count() === 4 * 2)
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("slidingRate: streaming equals batch; window arithmetic correct") {
    val streamed = runStream(
      EventsStream.slidingRate(streamEvents), "complete", "sliding")
    val batch = EventsStream.slidingRate(batchEvents)
    assert(canon(streamed) === canon(batch))
    // every window is exactly 1 hour long
    val spans = streamed.select(
      (col("w_end").cast("long") - col("w_start").cast("long")).as("span"))
      .distinct().as[Long].collect().toSeq
    assert(spans === Seq(3600L))
  }

  // NB: equivalence tests run with lateness > the fixture's 3.25 h span —
  // with maxFilesPerTrigger=1 the micro-batch arrival order of the 3 files
  // is not time-ordered, so a 2 h watermark would (correctly) drop
  // out-of-order events and the comparison would gate arrival order, not
  // the operator. Late-drop semantics get their own directed test below.

  test("dedupedEvents drops planted duplicate event_ids (streaming state)") {
    val streamed = runStream(
      EventsStream.dedupedEvents(streamEvents, lateness = "6 hours"),
      "append", "deduped")
    val expectedDistinct = batchEvents.select("event_id").distinct().count()
    assert(streamed.count() === expectedDistinct)
    assert(streamed.groupBy("event_id").count()
      .where(col("count") > 1).count() === 0)
  }

  test("watermark: append-mode windows finalize and late rows are dropped") {
    // three micro-batches driven as three AvailableNow runs over a growing
    // input dir, sharing one checkpoint (watermark persists across runs —
    // this also exercises checkpoint recovery):
    //   run 1: ts 01:00 ×5 → watermark below window end, nothing emitted
    //   run 2: ts 05:00 ×5 → watermark → 03:00; window [01:00,02:00)
    //          finalizes and is emitted with cnt=5
    //   run 3: ts 01:30 ×5 → behind the 03:00 watermark → dropped
    // Final append-mode output: exactly the one finalized window, cnt=5
    // (not 10 — run 3's late rows must not reach it); [05:00,06:00) stays
    // unemitted because the watermark never passes it.
    val inDir = tempDir("lateIn")
    val outDir = tempDir("lateOut").toString
    val ckpt = tempDir("lateCkpt").toString
    def addFile(hour: String, ids: Range, name: String): Unit = {
      val rows = ids.map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2026-01-01 $hour:00"), 0L, "click", 1.0))
      val tmp = tempDir("lateTmp")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, inDir.resolve(name))
    }
    val schema = batchEvents.schema
    def runOneBatch(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir.toString)
      val q = EventsStream.hourlyTypeCounts(stream, lateness = "2 hours")
        .writeStream.format("parquet").outputMode("append")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not terminate in time")
    }
    addFile("01:00", 0 until 5, "f1.parquet"); runOneBatch()
    addFile("05:00", 5 until 10, "f2.parquet"); runOneBatch()
    addFile("01:30", 10 until 15, "f3.parquet"); runOneBatch()
    val got = spark.read.schema(
        "hour timestamp, event_type string, cnt long, sum_value double")
      .parquet(outDir)
      .select(col("hour").cast("string"), col("cnt"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("2026-01-01 01:00:00", 5L)),
      "only the finalized window, without the late f3 rows")
  }

  test("userSessions: gap-based sessions equal batch session_window result") {
    val streamed = runStream(
      EventsStream.userSessions(streamEvents, lateness = "6 hours"),
      "complete", "sessions")
    val batch = EventsStream.userSessions(batchEvents)
    assert(canon(streamed) === canon(batch))
    // 5-min grid with per-user events 15 min apart and a 10-min gap →
    // each user's events fuse into one session only if gaps < 10 min;
    // here user events are 15 min apart → one session per event
    assert(streamed.where(col("n_events") =!= 1).count() === 0)
  }

  test("clickAttribution: stream-stream interval join equals the batch join") {
    val clicks = (df: DataFrame) => df.where(col("event_type") === "click")
    val purchases = (df: DataFrame) => df.where(col("event_type") === "view")
    // streaming: both sides from the same file source, joined with
    // watermarks + time bound (state-expirable stream-stream join)
    val streamed = runStream(
      EventsStream.clickAttribution(
        clicks(streamEvents), purchases(streamEvents),
        horizon = "30 minutes", lateness = "6 hours"),
      "append", "attrib")
    val batch = EventsStream.clickAttribution(
      clicks(batchEvents), purchases(batchEvents),
      horizon = "30 minutes", lateness = "6 hours")
    assert(canon(streamed) === canon(batch))
    assert(streamed.count() > 0, "fixture must produce attributed purchases")
    // every attribution is within the horizon and not in the future
    val bad = streamed.where(
      col("c_ts") > col("p_ts") ||
        col("c_ts") < col("p_ts") - expr("INTERVAL 30 minutes")).count()
    assert(bad === 0)
  }

  test("streaming word count equals the batch reference pipeline") {
    val dir = tempDir("wcStream")
    java.nio.file.Files.write(dir.resolve("a.txt"),
      "The quick brown fox\nthe lazy DOG".getBytes)
    java.nio.file.Files.write(dir.resolve("b.txt"),
      "dog eats Fox, fox wins!".getBytes)
    val streamed = runStream(
      StreamingWordCount.fromDirectory(spark, dir.toString),
      "complete", "wcstream")
      .orderBy("word").as[(String, Long)].collect().toSeq
    val batch = graft.wc.WordCount
      .fromDirectory(spark, dir.toString)
      .as[(String, Long)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.toMap.apply("fox") === 3L)
  }

  test("ivmSink materialized aggregate: folded micro-batch partials equal the batch aggregate") {
    val outDir = tempDir("ivmOut").toString
    val ckpt = tempDir("ivmCkpt").toString
    val q = EventsStream.ivmSink(streamEvents, outDir, ckpt)
    assert(q.awaitTermination(120000), "stream did not terminate in time")
    // 3 input files at maxFilesPerTrigger=1 → ≥2 micro-batch partials
    val batchDirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(batchDirs.length >= 2, "fixture must slice into micro-batches")
    val folded = EventsStream.readMaterialized(spark, outDir)
    val direct = EventsStream.ivmPartial(batchEvents)
    assert(canon(folded) === canon(direct),
      "merge(agg(b0), agg(b1), ...) == agg(all), bit-for-bit")
  }

  test("foreachBatch sink: per-micro-batch custom writes see every row once") {
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = streamEvents
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select("event_id").as[Long].collect()
          .foreach(id => seen.merge(id, 1L, _ + _))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in time")
    val expected = batchEvents.select("event_id").as[Long].collect()
    // dup event_ids exist in the fixture: every ROW arrives exactly once,
    // so per-id counts equal the batch frame's value_counts
    val expCounts = expected.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(seen.size === expCounts.size)
    expCounts.foreach { case (id, n) => assert(seen.get(id) === n, s"id $id") }
  }

  test("runningUserTotals (mapGroupsWithState) matches a plain groupBy in batch") {
    import EventsStream.Event
    val typed = batchEvents
      .withColumn("ts", col("ts").cast("timestamp"))
      .as[Event]
    val got = EventsStream.runningUserTotals(typed)
      .collect().map(u => (u.user_id, u.n_events, math.rint(u.total_value * 1e6) / 1e6))
      .sortBy(_._1).toSeq
    val exp = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2, math.rint(r._3 * 1e6) / 1e6)).sortBy(_._1).toSeq
    assert(got === exp)
  }
}
