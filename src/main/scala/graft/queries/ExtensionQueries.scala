package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Aggregators
import graft.ops.Multimodal

/** Extension-surface queries: the typed-Aggregator (UDAF) path and the
  * multimodal binary-column plumbing (SURVEY §2.2 "UDF/UDAF/UDTF surface";
  * north-star multimodal columns). The mapPartitions decode stage is
  * spec-tested (not SQL-expressible); the expression-level binary ops are
  * oracle-gated here.
  */
object ExtensionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed Aggregator (item-interface analogue) in an untyped agg.
    "q_udaf_rms" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          Aggregators.rms(col("l_quantity")).as("rms_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // Binary payload metadata: byte length, md5, header bytes as hex.
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.withPayload(Tables.table(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          lower(substring(hex(col("payload")), 1, 8)).as("header_hex"))
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(
    "q_udaf_rms" ->
      """SELECT l_returnflag,
            ROUND(sqrt(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                       / CAST(count(*) AS DOUBLE)), 6) AS rms_qty,
            count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_multimodal_meta" ->
      """SELECT doc_id,
            CAST(octet_length(encode(text)) AS INT) AS n_bytes,
            md5(text) AS payload_md5,
            lower(substr(hex(encode(text)), 1, 8)) AS header_hex
         FROM documents ORDER BY doc_id""",
  )
}
