package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
