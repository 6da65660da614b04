package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travel as opaque
  * `binary` payloads next to typed metadata, and per-item decoding runs as
  * batched partition-local processing — the Spark-side shape of a decode /
  * feature-extract stage. The actual media codecs are NOT in this
  * environment, so [[FakeDecoder]] is an explicitly-marked deterministic
  * stand-in; everything around it (schema, batching, partitioning, the
  * `mapPartitions` boundary) is the real production plumbing and is what
  * the tests cover.
  *
  * Scale notes: payloads stay columnar (parquet binary) until the decode
  * stage; the decode is a narrow `mapPartitions` (no shuffle), batched so a
  * vectorized/NAtive decoder could amortize per-call overhead — the same
  * batch shape `mapInPandas`/Arrow uses in PySpark.
  */
object Multimodal {

  /** One decoded media item's features. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, header: String,
                           checksum: Long, feature: Array[Float])

  /** STUB — deterministic fake decoder standing in for a real media codec
    * (???-grade: replace with actual image/audio decode where libs exist).
    * Consumes raw payload bytes, emits a fixed-width "feature" derived only
    * from the bytes, so tests and reruns are reproducible.
    */
  object FakeDecoder {
    val FeatureDim = 8

    def decode(payload: Array[Byte]): (String, Long, Array[Float]) = {
      val header = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      var checksum = 0L
      val feature = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xFFFFFFFFL
        feature(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (header, checksum, feature)
    }
  }

  /** Attach a binary payload column (here: the UTF-8 bytes of `textCol`,
    * standing in for stored media) plus byte-level metadata.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), encode(col(textCol), "UTF-8").as("payload"))

  /** Batched decode over partitions: the production plumbing. Batch size
    * bounds peak memory per task and gives a real decoder its
    * amortization unit; partition-local, so the stage is narrow and scales
    * with input splits.
    */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` in one vectorized call
          batch.iterator.map { case (id, bytes) =>
            val (header, checksum, feature) = FakeDecoder.decode(bytes)
            MediaFeatures(id, bytes.length, header, checksum, feature)
          }
        }
      }
  }
}
