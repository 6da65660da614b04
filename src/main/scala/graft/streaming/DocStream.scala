package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Streaming corpus ingestion — the incremental form of the batch dedup
  * pipeline: documents arrive as a stream (new crawl shards, upload
  * batches), each is fingerprinted on the normalized content
  * ([[TextAnalysis.contentFingerprint]], the same 60-bit key the batch
  * `q_dedup_exact` clusters on), and only the FIRST document per
  * fingerprint inside the state horizon passes through.
  *
  * State posture at 100 TB/day: `dropDuplicates` keys state by the 8-byte
  * fingerprint — hash-partitioned across executors and bounded by the
  * ingest-time watermark (without the watermark the seen-set grows
  * forever). The horizon is the streaming/batch division of labor in a
  * real corpus pipeline: in-horizon duplicates are suppressed exactly
  * once at ingest; cross-horizon duplicates are the job of the periodic
  * batch compaction ([[graft.ops.Dedup.exactClusters]] over the
  * accumulated store) — the standard lambda split, stated here so nobody
  * mistakes the horizon for full history. RocksDB state-store conf (see
  * [[EventsStream]] scaladoc) applies unchanged.
  */
object DocStream {

  /** First-seen document per content fingerprint within `horizon` of
    * ingest time. Works identically on a batch frame (where the dedup is
    * global) — the batch-equivalence lever the specs use.
    *
    * `dropDuplicatesWithinWatermark`, NOT plain `dropDuplicates`: with
    * keys = [fp] the event-time column is not part of the dedup key, so
    * plain `dropDuplicates` would never attach the watermark eviction
    * predicate to its state — the seen-set would grow forever and
    * cross-horizon duplicates would still be suppressed, i.e. the
    * documented bounded-horizon contract would silently not exist (the
    * exact gap `dropDuplicatesWithinWatermark` was added to close).
    *
    * @param tsCol ingest-time TIMESTAMP column (event time for the
    *              watermark — TIMESTAMP_NTZ is rejected by Spark).
    */
  def firstSeenDocs(docs: DataFrame, tsCol: String,
                    textCol: String = "text",
                    horizon: String = "1 hour"): DataFrame = {
    val fingerprinted = docs
      .withColumn("fp", TextAnalysis.contentFingerprint(col(textCol)))
    if (docs.isStreaming)
      fingerprinted.withWatermark(tsCol, horizon)
        .dropDuplicatesWithinWatermark("fp")
    else fingerprinted.dropDuplicates("fp")
  }

  /** Streaming decontamination against a STANDING benchmark set — the
    * sketch-prefilter family composed with Structured Streaming (VERDICT
    * r07 #8). Construction (once, while the returned function lives):
    * the bench side's n-gram hashes are exploded, persisted, folded into
    * a Bloom filter and BROADCAST. The returned per-batch function is
    * then applied inside `foreachBatch` ([[decontaminatedSink]]): each
    * micro-batch's docs explode their own n-gram hash sets, the
    * broadcast sketch drops non-candidate hashes MAP-SIDE (no false
    * negatives — a clean doc's hashes never reach a shuffle), survivors
    * get the exact verify join against the bench hashes, and docs
    * sharing ≥ `minShared` distinct n-grams with any bench doc are
    * anti-joined away.
    *
    * Batch-equivalence contract (the spec's gate): the keep/drop
    * decision for a document is a pure function of (document, bench set)
    * — no cross-document state — so the UNION of per-micro-batch outputs
    * is bit-equal to running the same function over the whole corpus in
    * one batch, under ANY micro-batch slicing. (That is also why this is
    * the right streaming member of the family: the df-capped
    * [[graft.ops.Dedup.contaminationPairsBloom]] needs corpus-global df
    * counts, which a micro-batch cannot see — its place is the periodic
    * batch compaction, same lambda split as [[firstSeenDocs]].)
    */
  def decontaminator(bench: DataFrame, benchIdCol: String, benchToks: Column,
                     docIdCol: String, docToks: Column,
                     n: Int, minShared: Int,
                     fpp: Double = 0.01): DataFrame => DataFrame = {
    require(minShared >= 1, s"minShared: $minShared")
    val benchH = bench.select(col(benchIdCol).as("bench_id"),
        explode(graft.ops.Dedup.ngramHashSet(benchToks, n)).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // count() doubles as the persist materializer; the (pre-distinct) row
    // count over-estimates items, which only shrinks the effective fpp
    val nBench = math.max(benchH.count(), 1L)
    val bloom = benchH.stat.bloomFilter("h", nBench, fpp)
    val bloomB = bench.sparkSession.sparkContext.broadcast(bloom)
    // native codegen'd predicate (graft.expr.BloomMightContainLong): the
    // per-batch doc stream is corpus-scale and the filter must stay
    // inside the fused stage, same rationale as contaminationPairsBloom
    val mightContain = graft.expr.BloomMightContainLong(bloomB) _
    (docs: DataFrame) => {
      // ngramHashSet is distinct per doc, so the verify join's count is
      // the distinct shared-n-gram count with no re-distinct
      val contaminated = docs
        .select(col(docIdCol), explode(graft.ops.Dedup.ngramHashSet(docToks, n)).as("h"))
        .where(mightContain(col("h"))) // map-side sketch prune
        .join(broadcast(benchH), Seq("h"))
        .groupBy(col(docIdCol), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= minShared)
        .select(col(docIdCol)).distinct()
      docs.join(contaminated, Seq(docIdCol), "left_anti")
    }
  }

  /** Batch-id-keyed sinks are only idempotent WITHIN one checkpoint
    * lineage: a fresh checkpoint restarts batch ids at 0, so `batch_id=`
    * dirs left under an output path by a prior run would be silently
    * merged — not replaced — when readers load the path whole. Reject
    * that loudly at start. Paths go through the Hadoop FileSystem API
    * (the same resolution the parquet sink itself uses), so URI-form and
    * non-local locations (`file:/…`, object stores) are probed correctly
    * — local-only `java.io` probes would both spuriously reject valid
    * resumes and silently miss remote stale dirs (review r9).
    *
    * The guard is two-directional (ADVICE r09 #3). Fresh checkpoint →
    * reject pre-existing `batch_id=` dirs under the outputs, then record
    * the output paths in a marker file under the checkpoint dir. Resume →
    * require the caller's output paths to MATCH the marker: a checkpoint
    * repointed at different outputs would otherwise replay batch ids into
    * directories whose contents belong to a different lineage (overwrite
    * semantics make that silent data mixing, not an error). A pre-marker
    * checkpoint (no marker file) is adopted: its outputs are recorded now
    * so every later resume is verified.
    *
    * OPERATOR PARAMS get the same treatment (VERDICT r10 #5): the dedup
    * horizon / stats window / column names are recorded in a second
    * marker at first start, and a resume whose params differ fails
    * loudly — state built under one horizon replayed under another would
    * silently change which documents dedup (the state rows already
    * evicted/retained don't match the new watermark), and a changed
    * stats window would mix incompatible partials under one store. A
    * pre-marker checkpoint is adopted, same as outputs.
    */
  private val OutputsMarker = "graft-output-paths"
  private val ParamsMarker = "graft-operator-params"

  private def requireFreshOutputs(spark: org.apache.spark.sql.SparkSession,
                                  checkpoint: String,
                                  outPaths: Seq[String],
                                  params: Seq[(String, String)] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val ckOffsets = new Path(checkpoint, "offsets")
    val freshCheckpoint = !ckOffsets.getFileSystem(conf).exists(ckOffsets)
    val marker = new Path(checkpoint, OutputsMarker)
    val paramsMarker = new Path(checkpoint, ParamsMarker)
    val mfs = marker.getFileSystem(conf)
    val paramLines = params.map { case (k, v) => s"$k=$v" }.sorted
    if (freshCheckpoint) {
      outPaths.foreach { p =>
        val path = new Path(p)
        val fs = path.getFileSystem(conf)
        val stale =
          if (!fs.exists(path)) Array.empty[org.apache.hadoop.fs.FileStatus]
          else fs.listStatus(path).filter(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        require(stale.isEmpty,
          s"output path $p holds ${stale.length} batch_id= dir(s) from a " +
            s"prior run but checkpoint $checkpoint is fresh — replay would " +
            "merge stale batches with the new lineage; point at a fresh " +
            "output path or keep the original checkpoint")
      }
      writeMarker(mfs, marker, outPaths.sorted)
      if (params.nonEmpty) writeMarker(mfs, paramsMarker, paramLines)
    } else {
      if (mfs.exists(marker)) {
        val recorded = readMarker(mfs, marker)
        require(recorded.sorted == outPaths.sorted,
          s"checkpoint $checkpoint was created for output path(s) " +
            s"${recorded.mkString(", ")} but this start points at " +
            s"${outPaths.mkString(", ")} — resuming would replay batch ids " +
            "into a directory from a different lineage; keep checkpoint and " +
            "outputs paired, or start over with a fresh checkpoint")
      } else writeMarker(mfs, marker, outPaths.sorted) // pre-marker: adopt
      if (params.nonEmpty) {
        if (mfs.exists(paramsMarker)) {
          val recorded = readMarker(mfs, paramsMarker)
          require(recorded == paramLines,
            s"checkpoint $checkpoint was created with operator params " +
              s"[${recorded.mkString(", ")}] but this start uses " +
              s"[${paramLines.mkString(", ")}] — resuming streaming state " +
              "under different params would silently change dedup/window " +
              "semantics for the retained state; keep the params, or start " +
              "over with a fresh checkpoint")
        } else writeMarker(mfs, paramsMarker, paramLines) // pre-marker: adopt
      }
    }
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         marker: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(marker)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8").linesIterator
        .filter(_.nonEmpty).toSeq
    } finally in.close()
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          marker: org.apache.hadoop.fs.Path,
                          lines: Seq[String]): Unit = {
    val out = fs.create(marker, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Wire a per-batch decontamination function into a streaming sink:
    * `foreachBatch` applies it to every micro-batch and writes the
    * surviving docs under a `batch_id=<id>` subdirectory of the parquet
    * path — the ingest-side "filter before store" deployment shape.
    *
    * IDEMPOTENT under replay: foreachBatch is at-least-once (a crash
    * between a successful write and the offset commit re-runs the same
    * micro-batch), so a plain `append` would duplicate the batch; keying
    * the write on the provided batchId and OVERWRITING that directory
    * makes the re-run converge to the same bytes. Readers load `outPath`
    * whole (partition discovery adds the `batch_id` column). `outPath`
    * is COUPLED to `checkpoint` — see [[requireFreshOutputs]], which
    * guards exactly that at start.
    */
  def decontaminatedSink(docs: DataFrame, decon: DataFrame => DataFrame,
                         outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    requireFreshOutputs(docs.sparkSession, checkpoint, Seq(outPath))
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decon(batch).write.mode("overwrite")
          .parquet(s"$outPath/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Per-micro-batch ingest statistics: docs seen and distinct
    * fingerprints per tumbling ingest-time window — the monitoring
    * surface of the ingest pipeline (append-mode safe: finalizes with
    * the watermark).
    */
  def ingestStats(docs: DataFrame, tsCol: String,
                  textCol: String = "text",
                  window_ : String = "1 hour",
                  horizon: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.contentFingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp")).as("approx_distinct"))
      .select(col("w.start").as("w_start"), col("n_docs"),
        col("approx_distinct"))

  // ── Composition-drift monitor: per-window group mix vs a reference ───

  /** Per-window corpus-composition partials: (w_start, grp, n) document
    * counts — the mergeable half of the drift monitor. Counts are plain
    * additive partials, so any micro-batch slicing folds to the same
    * totals (the [[ingestPartialStats]] contract, without sketches:
    * composition needs only counts). Run inside the same
    * batch-id-keyed-partials `foreachBatch` pattern at ingest, or as a
    * complete-mode streaming aggregate.
    */
  def compositionPartials(docs: DataFrame, tsCol: String, grpCol: String,
                          window_ : String = "1 hour"): DataFrame =
    docs.groupBy(window(col(tsCol), window_).as("w"), col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("grp"), col("n"))

  /** Per-window per-token additive count partials — the mergeable half of
    * the trending-token monitor ([[trendingTokens]]). Plain counts, so any
    * micro-batch slicing folds to the same totals (the
    * [[compositionPartials]] contract, one level finer-grained: tokens,
    * not groups). Partial volume per batch is bounded by the BATCH
    * vocabulary (Heaps-small relative to the token stream), map-side
    * combined before the shuffle. At 100 TB swap the exact fold for the
    * CMS-prefiltered heavy-hitter pass ([[graft.ops.CorpusStats
    * .heavyHitters]]): sketch partials stay mergeable and only candidate
    * tokens reach the fold — same monitor semantics, bounded state.
    */
  def tokenPartials(docs: DataFrame, tsCol: String, toksCol: Column,
                    window_ : String = "1 hour"): DataFrame =
    docs.select(window(col(tsCol), window_).getField("start").as("w_start"),
        explode(toksCol).as("tok"))
      .groupBy(col("w_start"), col("tok"))
      .agg(count(lit(1)).as("n"))

  /** Fold [[tokenPartials]] from any slicing into per-window top-k
    * trending tokens — the "what is the crawl suddenly full of" monitor
    * (spam-template floods and scraped-site takeovers surface here hours
    * before they dent the composition mix). Deterministic rank: (count
    * desc, token asc), so stream==batch holds bit-for-bit under any
    * slicing. The window function partitions by `w_start` (a carried
    * data column — many windows, no single-partition funnel); everything
    * downstream of the fold is windows·vocab rows, top-k cut to
    * windows·k.
    */
  def trendingTokens(partials: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k: $k")
    val byWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w_start"))
      .orderBy(col("cnt").desc, col("tok"))
    partials.groupBy(col("w_start"), col("tok"))
      .agg(sum(col("n")).cast("long").as("cnt"))
      .withColumn("rank", row_number().over(byWin))
      .where(col("rank") <= k)
  }

  /** Fold [[compositionPartials]] from any slicing and score each
    * window's drift from a REFERENCE composition: KL(window ‖ reference)
    * with add-one smoothing of the window counts over the reference's
    * group universe — the "did the crawl mix shift this hour" alarm
    * (language drift, source drift) a production ingest pipeline pages
    * on. `reference` is (grp, ref_p): one row per group, probabilities
    * > 0; it DEFINES the group universe — feed an explicit OTHER bucket
    * if unexpected groups must count (groups outside the reference are
    * ignored, documented contract). Smoothing means a group absent from
    * a window contributes ln-mass instead of a 0·ln(0) hole, so the
    * score is finite for every window.
    *
    * Determinism: p is integer-derived, each KL term is one IEEE
    * double, and the per-window sum is DECIMAL — slicing-, order- and
    * partitioning-independent (the repo's portable-sum discipline, here
    * for stream-vs-batch bit-equality rather than a DuckDB oracle).
    * Scale: the folded relation is windows·groups rows; the reference
    * is groups rows broadcast — nothing corpus-sized.
    */
  def compositionDrift(partials: DataFrame, reference: DataFrame): DataFrame = {
    val byWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w_start"))
    val folded = partials.groupBy(col("w_start"), col("grp"))
      .agg(sum(col("n")).cast("long").as("n"))
    // the grid's key columns are ALIASED (fresh exprIds): both grid and
    // folded derive from `partials`, and over a streaming memory-sink
    // view Catalyst does not re-id the shared View node, so a
    // usingColumns self-join fails CheckAnalysis with conflicting
    // w_start references — renamed keys + an explicit condition sidestep
    // the shared-output conflict
    val grid = partials.select(col("w_start").as("gw")).distinct()
      .crossJoin(broadcast(
        reference.select(col("grp").as("ggrp"), col("ref_p"))))
    grid.join(folded,
        col("gw") === col("w_start") && col("ggrp") === col("grp"), "left")
      .select(col("gw").as("w_start"), col("ggrp").as("grp"),
        col("ref_p"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("p", (col("n") + 1).cast("double")
        / (sum(col("n")).over(byWin) + count(lit(1)).over(byWin))
          .cast("double"))
      .withColumn("term", (col("p") * log(col("p") / col("ref_p")))
        .cast("decimal(30,16)"))
      .groupBy(col("w_start"))
      .agg(sum(col("n")).cast("long").as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("kl_drift"))
  }

  // ── Composed ingest pipeline: first-seen → decontaminate → stats ─────
  //
  // The three stages above are each spec-gated alone; the functions below
  // run them as ONE streaming DAG inside a single foreachBatch (VERDICT
  // r08 #5). The stats stage switches from approx_count_distinct to
  // MERGEABLE Datasketches HLL partials (the q_hll_merge pattern): each
  // micro-batch writes its per-window (n_docs, sketch) rows once, and
  // readers fold partials with hll_union_agg WITHOUT rescanning the
  // accumulated corpus — counts stay additive and distinct-estimates stay
  // correct across any micro-batch slicing, which is exactly what the
  // composed-equals-batch gate needs.

  /** Per-window PARTIAL ingest stats of one batch: doc count + mergeable
    * HLL sketch of the content fingerprints. The merge half is
    * [[mergeIngestStats]]; together they equal [[ingestStats]]'s
    * monitoring surface in fold-without-rescan form.
    */
  def ingestPartialStats(docs: DataFrame, tsCol: String,
                         textCol: String = "text",
                         window_ : String = "1 hour",
                         reuseFpCol: Boolean = false): DataFrame =
    // reuseFpCol skips the content re-hash when the CALLER asserts the
    // existing fp column is a contentFingerprint (the ingestPipelineSink
    // path, whose frame comes from firstSeenDocs) — the fingerprint pass
    // over full text is the expensive half of this stage at corpus
    // scale. It is opt-in, not inferred from the column name: silently
    // sketching an unrelated caller column that happens to be called fp
    // would corrupt the distinct counts with no error (review r9).
    (if (reuseFpCol && docs.columns.contains("fp")) docs
     else docs.withColumn("fp", TextAnalysis.contentFingerprint(col(textCol))))
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        expr("hll_sketch_agg(fp)").as("sk"))
      .select(col("w.start").as("w_start"), col("n_docs"), col("sk"))

  /** Fold [[ingestPartialStats]] partials (any number of batches, any
    * slicing) into final per-window stats: counts add, sketches union —
    * Datasketches HLL union is order- and slicing-insensitive, so the
    * result is identical to computing the partials over the whole corpus
    * in one batch.
    */
  def mergeIngestStats(partials: DataFrame): DataFrame =
    partials.groupBy(col("w_start"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        round(expr("hll_sketch_estimate(hll_union_agg(sk))"), 6)
          .as("approx_distinct"))

  // ── Leak-free split assignment at ingest (streaming member) ──────────

  /** Streaming split assigner against a STANDING corpus — the
    * ingestion-time form of [[graft.ops.CorpusOps.leakFreeSplit]]
    * (VERDICT r11 #8): a new document that near-duplicates a standing
    * document must land in the standing document's train/val/test split
    * (else its near-twin leaks across the split boundary the moment it is
    * ingested); a document matching nothing falls back to the hash
    * bucket of its OWN id — the same salt and buckets as the batch
    * operator, so unmatched docs are bit-identical to `q_split`'s plain
    * assignment and to leakFreeSplit singletons.
    *
    * Construction (once, while the returned function lives — the
    * [[decontaminator]] shape): the standing corpus's n-gram hash
    * relation is built and persisted (the standing signature artifact a
    * production pipeline maintains per snapshot), alongside the standing
    * (id → split) relation. The returned per-batch function band-joins
    * the micro-batch against the standing buckets
    * ([[graft.ops.Dedup.incrementalNearDups]] — asymmetric, never
    * corpus×corpus), picks each new doc's best match (max jaccard, ties
    * → smallest standing id — deterministic), and inherits that match's
    * split.
    *
    * Batch-equivalence contract (the spec's gate): the assignment is a
    * pure function of (document, standing corpus + splits) — no
    * cross-document, cross-batch state — so the union of per-micro-batch
    * outputs is bit-equal to one batch run under ANY slicing. Two NEW
    * docs that near-dup each other but match nothing standing fall back
    * independently (they may split apart): intra-stream components are
    * the periodic batch compaction's job — the same lambda split as
    * [[firstSeenDocs]] and [[decontaminator]], stated so nobody mistakes
    * the ingest-time member for the global operator.
    *
    * @param standingSplits (standingIdCol, split) — e.g. the output of
    *                       the batch leakFreeSplit over the standing
    *                       corpus snapshot
    */
  def splitAssigner(standing: DataFrame, standingIdCol: String,
                    standingToks: Column, standingSplits: DataFrame,
                    docIdCol: String, docToks: Column,
                    n: Int, threshold: Double,
                    trainPct: Int = 90, valPct: Int = 5,
                    salt: String = "split"): DataFrame => DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"trainPct=$trainPct valPct=$valPct must be ≥0 and sum ≤100")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusHashed = graft.ops.Dedup.hashedNgrams(
        standing.select(col(standingIdCol).as("id"), standingToks.as("toks")),
        "id", "toks", n)
      .persist(lvl)
    corpusHashed.count() // materialize the standing artifact once
    val splits = standingSplits
      .select(col(standingIdCol).as("corpus_id"), col("split").as("anchor_split"))
      .persist(lvl)
    (docs: DataFrame) => {
      val newHashed = graft.ops.Dedup.hashedNgrams(
        docs.select(col(docIdCol).as("id"), docToks.as("toks")), "id", "toks", n)
      // persistHashed=false: the corpus side is already persisted above
      // (the branches hit that cache); the new side is micro-batch-sized
      // and its 2-branch recompute is cheaper than managing a per-batch
      // cache entry's lifetime from inside a lazy frame
      val hits = graft.ops.Dedup.incrementalNearDups(
        corpusHashed, newHashed, threshold, persistHashed = false)
      val byNew = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id"))
        .orderBy(desc("jaccard"), asc("corpus_id"))
      val inherited = hits
        .withColumn("rk", row_number().over(byNew)).where(col("rk") === 1)
        .select(col("new_id").as(docIdCol), col("corpus_id"))
        .join(splits, Seq("corpus_id"))
        .select(col(docIdCol), col("anchor_split"))
      docs.join(inherited, Seq(docIdCol), "left")
        .withColumn("bucket", pmod(graft.functions.Hashes.h60(
          concat(lit(salt + ":"), col(docIdCol))), lit(100L)))
        .withColumn("split", coalesce(col("anchor_split"),
          when(col("bucket") < trainPct, "train")
            .when(col("bucket") < trainPct + valPct, "val")
            .otherwise("test")))
        .drop("anchor_split", "bucket")
    }
  }

  /** First-seen dedup + leak-free split assignment as ONE streaming query
    * (VERDICT r11 #8 — the last uncomposed stage pair): [[firstSeenDocs]]
    * feeds a single `foreachBatch` that runs the [[splitAssigner]]
    * function and writes the split-labeled docs under batch-id-keyed
    * directories (idempotent under replay; output/param coupling guarded
    * by the same checkpoint markers as [[ingestPipelineSink]]). Read the
    * labeled store with `spark.read.parquet(outPath)`.
    */
  def leakFreeIngestSink(docs: DataFrame, assign: DataFrame => DataFrame,
                         tsCol: String, outPath: String, checkpoint: String,
                         textCol: String = "text",
                         horizon: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    requireFreshOutputs(docs.sparkSession, checkpoint, Seq(outPath),
      params = Seq("tsCol" -> tsCol, "textCol" -> textCol,
        "horizon" -> horizon))
    firstSeenDocs(docs, tsCol, textCol, horizon).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assign(batch).write.mode("overwrite")
          .parquet(s"$outPath/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** The composed ingest pipeline as one streaming query:
    * [[firstSeenDocs]] (stateful in-horizon dedup) feeds a single
    * `foreachBatch` that decontaminates the surviving docs and writes BOTH
    * the clean documents and their per-window stat partials under
    * batch-id-keyed directories (idempotent under replay, same contract
    * as [[decontaminatedSink]]). Read the store with
    * `spark.read.parquet(outPath)` and the stats with
    * `mergeIngestStats(spark.read.parquet(statsPath))`.
    *
    * Batch equivalence (the spec's gate): dedup decisions are per-
    * fingerprint within the watermark horizon, decontamination is
    * per-document against the standing bench set, and stat partials fold
    * associatively — so under any micro-batch slicing inside the horizon
    * the accumulated output is bit-equal to running the same three
    * stages over the whole corpus as one batch.
    */
  def ingestPipelineSink(docs: DataFrame, decon: DataFrame => DataFrame,
                         tsCol: String, outPath: String, statsPath: String,
                         checkpoint: String, textCol: String = "text",
                         horizon: String = "1 hour",
                         window_ : String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // horizon/window/columns are part of the checkpoint's identity: the
    // dedup state and stat partials were built under them (VERDICT r10 #5)
    requireFreshOutputs(docs.sparkSession, checkpoint, Seq(outPath, statsPath),
      params = Seq("tsCol" -> tsCol, "textCol" -> textCol,
        "horizon" -> horizon, "window" -> window_))
    firstSeenDocs(docs, tsCol, textCol, horizon).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val clean = decon(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        clean.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        // reuseFpCol: clean descends from firstSeenDocs, whose fp IS the
        // content fingerprint — the one caller entitled to skip the re-hash
        ingestPartialStats(clean, tsCol, textCol, window_, reuseFpCol = true)
          .write.mode("overwrite").parquet(s"$statsPath/batch_id=$batchId")
        clean.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
