package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus ingestion: fingerprint first-seen dedup and ingest
  * stats, gated by batch equivalence (SURVEY §5 — streaming has no DuckDB
  * oracle).
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  /** 30 docs over 90 minutes in 3 parquet files; every third doc is a
    * case/punctuation-mangled duplicate of an earlier one, so fingerprints
    * collide across micro-batches while raw texts differ.
    */
  private lazy val docsDir: String = {
    val dir = tempDir("docStream").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (0 until 30).map { i =>
      val ts = new java.sql.Timestamp(base.getTime + i * 3 * 60 * 1000L)
      val text =
        if (i % 3 == 2) s"Document number ${i - 2} with some shared words!!!"
        else s"document number $i with some shared words"
      (i.toLong, ts, text)
    }
    rows.toDF("doc_id", "ingest_ts", "text")
      .repartition(3)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def batchDocs: DataFrame = spark.read.parquet(docsDir)

  private def streamDocs: DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(docsDir)
  }

  private def runStream(df: DataFrame, mode: String, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000),
      s"stream '$name' did not terminate in time — memory table is partial")
    spark.table(name)
  }

  test("firstSeenDocs: one survivor per fingerprint, equal to batch distinct") {
    // horizon > fixture span: arrival order of the 3 files is not
    // time-ordered under maxFilesPerTrigger=1, so a tight watermark would
    // gate arrival order, not the operator (EventsStreamSpec precedent)
    val streamed = runStream(
      DocStream.firstSeenDocs(streamDocs, "ingest_ts", horizon = "6 hours"),
      "append", "firstSeen")
    val batchFp = batchDocs
      .withColumn("fp", graft.ops.TextAnalysis.contentFingerprint(col("text")))
    val expected = batchFp.select("fp").distinct().count()
    assert(streamed.count() === expected)
    assert(streamed.groupBy("fp").count().where(col("count") > 1).count() === 0)
    // the mangled twin of doc 0 ("Document number 0 ... !!!") must have
    // collided with doc 0's fingerprint: both can't survive
    val fp0 = batchFp.where(col("doc_id") === 0).select("fp").as[Long].head()
    assert(streamed.where(col("fp") === fp0).count() === 1)
    // 20 originals, 10 mangled dups ⇒ 20 distinct fingerprints
    assert(expected === 20L)
  }

  test("ingestStats: streaming equals batch; counts cover every doc") {
    val streamed = runStream(
      DocStream.ingestStats(streamDocs, "ingest_ts", horizon = "6 hours"),
      "complete", "ingestStats")
    val batch = DocStream.ingestStats(batchDocs, "ingest_ts", horizon = "6 hours")
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])
    assert(canon(streamed) === canon(batch))
    assert(streamed.agg(sum("n_docs")).as[Long].head() === 30L)
  }

  test("trendingTokens: slicing-insensitive fold, stream == batch, planted flood ranks first") {
    // window 1: "spam" floods (6×) over background tokens; window 2 is
    // background only — the monitor must surface the flood at rank 1 and
    // break count ties by token asc
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(0), "spam spam spam alpha beta"),
      (2L, ts(10), "spam spam spam beta gamma"),
      (3L, ts(70), "alpha beta gamma"),
      (4L, ts(80), "delta epsilon"))
    val dir = tempDir("trendDocs").toString
    rows.toDF("doc_id", "ingest_ts", "text").repartition(2)
      .write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
    def toks = graft.ops.TextAnalysis.tokens(col("text"))
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])

    val whole = DocStream.trendingTokens(
      DocStream.tokenPartials(batch, "ingest_ts", toks), k = 3)
    // fold associativity: per-file partials unioned == one-batch partials
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val sliced = files.map(f => DocStream.tokenPartials(
        spark.read.parquet(f), "ingest_ts", toks))
      .reduce(_.union(_))
    assert(canon(DocStream.trendingTokens(sliced, 3)) === canon(whole),
      "top-k over sliced partials must equal the one-batch cut")
    // streaming complete-mode partials == batch
    val schema = batch.schema
    val streamed = runStream(
      DocStream.tokenPartials(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(dir),
        "ingest_ts", toks),
      "complete", "trendPartials")
    assert(canon(DocStream.trendingTokens(streamed, 3)) === canon(whole))
    // planted flood: window-1 rank 1 is the spam token with count 6;
    // ties (alpha/gamma at 1) break token-asc so rank 3 is deterministic
    val w1 = whole.orderBy("w_start", "rank")
      .select("tok", "cnt", "rank").as[(String, Long, Int)].collect().toSeq
    assert(w1.take(3) === Seq(("spam", 6L, 1), ("beta", 2L, 2), ("alpha", 1L, 3)))
  }

  test("compositionDrift: slicing-insensitive fold, stream == batch, planted drift ranks") {
    // two 1-hour windows: balanced (2 a, 2 b) then skewed (4 a, 0 b)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(0), "a"), (2L, ts(10), "a"), (3L, ts(20), "b"), (4L, ts(30), "b"),
      (5L, ts(70), "a"), (6L, ts(80), "a"), (7L, ts(90), "a"), (8L, ts(100), "a"))
    val dir = tempDir("driftDocs").toString
    rows.toDF("doc_id", "ingest_ts", "grp").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
    val ref = Seq(("a", 0.5), ("b", 0.5)).toDF("grp", "ref_p")
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])

    val whole = DocStream.compositionDrift(
      DocStream.compositionPartials(batch, "ingest_ts", "grp"), ref)
    // fold associativity: per-file partials unioned == one-batch partials
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val sliced = files.map(f => DocStream.compositionPartials(
        spark.read.parquet(f), "ingest_ts", "grp"))
      .reduce(_.union(_))
    assert(canon(DocStream.compositionDrift(sliced, ref)) === canon(whole),
      "drift over sliced partials must equal the one-batch score")
    // streaming complete-mode aggregate == batch
    val schema = batch.schema
    val streamed = runStream(
      DocStream.compositionPartials(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(dir),
        "ingest_ts", "grp"),
      "complete", "driftPartials")
    assert(canon(DocStream.compositionDrift(streamed, ref)) === canon(whole))
    // planted drift: the skewed window must score strictly higher, and
    // both scores are finite despite b's zero count in window 2
    val scores = whole.orderBy("w_start")
      .select("n_docs", "kl_drift").as[(Long, Double)].collect().toSeq
    assert(scores.map(_._1) === Seq(4L, 4L))
    assert(scores(1)._2 > scores(0)._2,
      s"skewed window must out-drift the balanced one: $scores")
    assert(scores.forall(s => !s._2.isNaN && !s._2.isInfinite))
  }

  test("decontaminator: foreachBatch stream == batch, sketch keeps every clean doc") {
    def toks = graft.ops.TextAnalysis.tokens(col("text"))
    // bench doc = verbatim copy of doc 3 ⇒ doc 3 AND its mangled twin
    // doc 5 ("Document number 3 ... !!!", identical token stream) share
    // all six 3-grams; every other doc shares exactly the two 3-grams of
    // the common tail "with some shared words" — under minShared = 3
    // precisely {3, 5} are contaminated
    val bench = Seq((100L, "document number 3 with some shared words"))
      .toDF("bench_id", "text")
    val decon = DocStream.decontaminator(bench, "bench_id", toks,
      "doc_id", toks, n = 3, minShared = 3)
    val batchClean = decon(batchDocs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(!batchClean.contains(3L) && !batchClean.contains(5L),
      "bench copy and its mangled twin must be dropped")
    assert(batchClean.size === 28,
      s"docs sharing only the 2-n-gram tail must survive: $batchClean")
    // stream the same corpus one file per micro-batch through the SAME
    // per-batch function inside foreachBatch; union of outputs must be
    // bit-equal to the batch run (per-doc decisions carry no cross-batch
    // state)
    val out = tempDir("deconOut").toString + "/clean"
    val ck = tempDir("deconCk").toString
    val q = DocStream.decontaminatedSink(streamDocs, decon, out, ck)
    assert(q.awaitTermination(120000), "decontamination stream did not finish")
    val streamed = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(streamed === batchClean)
    spark.catalog.clearCache()
  }

  test("ingestPipelineSink: composed stream == composed batch under 3-slice replay") {
    // Fixture: 12 originals over 3 hours plus 3 BYTE-IDENTICAL duplicate
    // rows (same doc_id/ts/text — the same crawl shard delivered twice),
    // so whichever copy the dedup keeps, the surviving ROW is identical
    // and bit-for-bit comparison is meaningful. Doc 5 is a verbatim bench
    // match (≥3 shared 3-grams); every other doc shares only the
    // 2-3-gram tail and must survive decontamination.
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val originals = (0 until 12).map { i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 15 * 60 * 1000L),
        s"unique document $i with shared tail words")
    }
    val rows = originals ++ Seq(0, 3, 7).map(originals(_))
    val dir = tempDir("pipeDocs").toString
    rows.toDF("doc_id", "ingest_ts", "text")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)

    def toks = graft.ops.TextAnalysis.tokens(col("text"))
    val bench = Seq((100L, "unique document 5 with shared tail words"))
      .toDF("bench_id", "text")
    val decon = DocStream.decontaminator(bench, "bench_id", toks,
      "doc_id", toks, n = 3, minShared = 3)

    val out = tempDir("pipeOut").toString + "/clean"
    val stats = tempDir("pipeStats").toString + "/stats"
    val ck = tempDir("pipeCk").toString
    val q = DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
      out, stats, ck, horizon = "6 hours", window_ = "1 hour")
    assert(q.awaitTermination(120000), "composed pipeline did not finish")

    // composed batch: the SAME three stages over the whole corpus at once
    val cleanBatch = decon(DocStream.firstSeenDocs(
      spark.read.parquet(dir), "ingest_ts", horizon = "6 hours"))
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).toSeq).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])
    val docCols = Seq("doc_id", "ingest_ts", "text", "fp").map(col)
    assert(canon(spark.read.parquet(out).select(docCols: _*))
      === canon(cleanBatch.select(docCols: _*)),
      "accumulated clean store must equal the one-batch run bit-for-bit")
    assert(canon(DocStream.mergeIngestStats(spark.read.parquet(stats)))
      === canon(DocStream.mergeIngestStats(
        DocStream.ingestPartialStats(cleanBatch, "ingest_ts"))),
      "folded stat partials must equal the one-batch stats bit-for-bit")
    // 11 survivors (12 originals − doc 5), no window lost
    assert(spark.read.parquet(out).count() === 11L)
    // stale-output guard: a FRESH checkpoint pointed at the populated
    // outPath must be rejected, not silently merged
    val ck2 = tempDir("pipeCk2").toString
    val err = intercept[IllegalArgumentException] {
      DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
        out, stats, ck2, horizon = "6 hours")
    }
    assert(err.getMessage.contains("batch_id="))
    // resume guard (marker file): the ORIGINAL checkpoint repointed at a
    // DIFFERENT output path must be rejected too — replaying batch ids
    // into a directory from another lineage is silent data mixing
    val err2 = intercept[IllegalArgumentException] {
      DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
        tempDir("pipeOut2").toString + "/clean", stats, ck, horizon = "6 hours")
    }
    assert(err2.getMessage.contains("different lineage"))
    // param guard (VERDICT r10 #5): same checkpoint, same outputs, but a
    // DIFFERENT dedup horizon — the retained state was built under the
    // old horizon, so resuming under a new one would silently change
    // which documents dedup; must fail loudly at start
    val err3 = intercept[IllegalArgumentException] {
      DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
        out, stats, ck, horizon = "2 hours", window_ = "1 hour")
    }
    assert(err3.getMessage.contains("operator params"))
    // ...and a changed stats window is equally a state-identity change
    val err4 = intercept[IllegalArgumentException] {
      DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
        out, stats, ck, horizon = "6 hours", window_ = "30 minutes")
    }
    assert(err4.getMessage.contains("operator params"))
    // while the matched resume (same checkpoint, same outputs) still starts
    val q2 = DocStream.ingestPipelineSink(stream, decon, "ingest_ts",
      out, stats, ck, horizon = "6 hours", window_ = "1 hour")
    assert(q2.awaitTermination(120000), "matched resume did not finish")
    assert(spark.read.parquet(out).count() === 11L)
    spark.catalog.clearCache()
  }

  test("quality-rule filter at ingest: gopherRules inside foreachBatch == batch") {
    // the rule flags are a pure function of each document (the repetition
    // rule's aggregate is per-doc, not cross-doc), so the filter is
    // micro-batch-slicing-safe and plugs into the generic per-batch sink
    // unchanged — the ingest-time quality gate deployment shape
    val ruleKeep = (df: DataFrame) => df.join(
      graft.ops.TextAnalysis.gopherRules(df, "doc_id", "text",
          minWords = 5).where(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    // dedicated fixture: even docs carry stopwords and varied vocabulary
    // (keep); odd docs are 6/7 the same token (repetition rule drops)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (0 until 12).map { i =>
      val text =
        if (i % 2 == 0) s"the data of run $i is fine for it case$i extra$i"
        else s"spam spam spam spam spam spam mix$i"
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 60000L), text)
    }
    val dir = tempDir("ruleDocs").toString
    rows.toDF("doc_id", "ingest_ts", "text")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchKept = ruleKeep(spark.read.parquet(dir)).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(batchKept === Seq(0L, 2L, 4L, 6L, 8L, 10L),
      s"even docs keep, repetition-heavy odd docs drop: $batchKept")
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = tempDir("ruleOut").toString + "/kept"
    val ck = tempDir("ruleCk").toString
    val q = DocStream.decontaminatedSink(stream, ruleKeep, out, ck)
    assert(q.awaitTermination(120000), "rule-filter stream did not finish")
    val streamed = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(streamed === batchKept)
    spark.catalog.clearCache()
  }

  test("leakFreeIngestSink: near-dups inherit the standing split, stream == batch") {
    def toks = graft.ops.TextAnalysis.tokens(col("text"))
    // standing corpus snapshot with hand-assigned splits (in production:
    // the batch leakFreeSplit's output over the accumulated store)
    val standing = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (101L, "india juliet kilo lima mike november oscar papa"),
      (102L, "quebec romeo sierra tango uniform victor whiskey xray"))
      .toDF("doc_id", "text")
    val standingSplits = Seq((100L, "test"), (101L, "train"), (102L, "val"))
      .toDF("doc_id", "split")
    val assign = DocStream.splitAssigner(standing, "doc_id", toks,
      standingSplits, "doc_id", toks, n = 3, threshold = 0.8)

    // 12 new docs over 3 hours + a byte-identical duplicate row of doc 2
    // (exercises the first-seen stage); doc 5 is a VERBATIM copy of
    // standing 100 (split "test"), doc 7 a case/punct-mangled copy of
    // standing 102 (identical token stream ⇒ jaccard 1, split "val");
    // every other doc has a disjoint token stream and must fall back to
    // the hash bucket of its own id
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val originals = (0 until 12).map { i =>
      val text = i match {
        case 5 => "alpha bravo charlie delta echo foxtrot golf hotel"
        case 7 => "Quebec, Romeo; SIERRA tango uniform victor whiskey XRAY!!"
        case _ => s"solo item x$i y${i}a y${i}b y${i}c z$i"
      }
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 15 * 60 * 1000L), text)
    }
    val rows = originals ++ Seq(originals(2))
    val dir = tempDir("splitDocs").toString
    rows.toDF("doc_id", "ingest_ts", "text")
      .repartition(3).write.mode("overwrite").parquet(dir)

    // batch reference: the SAME two stages over the whole corpus at once
    val labeledBatch = assign(DocStream.firstSeenDocs(
      spark.read.parquet(dir), "ingest_ts", horizon = "6 hours"))
    val byId = labeledBatch.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(byId(5L) === "test", "verbatim twin of standing 100 inherits test")
    assert(byId(7L) === "val", "mangled twin of standing 102 inherits val")
    // unmatched docs: bit-identical to the plain hash split (same salt,
    // same buckets as CorpusOps.leakFreeSplit singletons / q_split)
    val expected = spark.range(12).select(col("id").as("doc_id"),
        pmod(graft.functions.Hashes.h60(
          concat(lit("split:"), col("doc_id"))), lit(100L)).as("b"))
      .select(col("doc_id"), when(col("b") < 90, "train")
        .when(col("b") < 95, "val").otherwise("test").as("split"))
      .as[(Long, String)].collect().toMap
    (0L until 12L).filterNot(i => i == 5L || i == 7L).foreach { i =>
      assert(byId(i) === expected(i), s"doc $i must use its own hash bucket")
    }

    // streaming: same composition, one file per micro-batch, accumulated
    // store must equal the batch run bit-for-bit
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = tempDir("splitOut").toString + "/labeled"
    val ck = tempDir("splitCk").toString
    val q = DocStream.leakFreeIngestSink(stream, assign, "ingest_ts",
      out, ck, horizon = "6 hours")
    assert(q.awaitTermination(120000), "leak-free ingest did not finish")
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).toSeq).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])
    val cols = Seq("doc_id", "ingest_ts", "text", "fp", "split").map(col)
    assert(canon(spark.read.parquet(out).select(cols: _*))
      === canon(labeledBatch.select(cols: _*)),
      "accumulated labeled store must equal the one-batch run bit-for-bit")
    assert(spark.read.parquet(out).count() === 12L, "first-seen drops the dup row")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
