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

    // REAL image decode (javax.imageio) gated against analytic ground
    // truth: each doc gets a deterministic synthetic PNG (geometry and
    // pixels are closed forms of doc_id — Multimodal.SyntheticImages),
    // the engine DECODES the actual PNG bytes back, and the oracle
    // recomputes the expected geometry + exact integer pixel statistics
    // without any codec. A decode defect (wrong size, band order,
    // sample corruption) breaks the hash.
    "q_decode_meta" -> ((s, dir) => {
      val payloads = Multimodal.syntheticImagePayloads(
        s, Tables.table(s, dir, "documents").select("doc_id"))
      Multimodal.decodeImageMeta(s, payloads).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_channels"),
          col("px_sum"), col("px_min"), col("px_max"),
          round(col("px_sum").cast("double")
            / (col("width") * col("height")), 6).as("mean_px"))
        .orderBy("doc_id")
    }),

    // Byte-stride downsample ("resize" stand-in): every 4th byte; the
    // output length and md5 prove the selection picked exactly the right
    // bytes (ASCII fixture — string-side oracle sees the same bytes).
    "q_resize" -> ((s, dir) =>
      Multimodal.withPayload(
          Tables.table(s, dir, "documents").where(col("doc_id") < 100),
          "doc_id", "text")
        // materialize the downsample ONCE: it's an aggregate-HOF fold, and
        // Catalyst neither CSEs across lambda bodies nor codegens HOFs —
        // inlining it at both use sites would run the O(len) fold twice
        // per row (the q_redact duplication class)
        .select(col("doc_id"), col("payload"),
          Multimodal.stridedDownsample(col("payload"), 4).as("resized"))
        .select(col("doc_id"),
          length(col("payload")).as("orig_bytes"),
          length(col("resized")).as("out_bytes"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id")),

    // Frame-sampling plan: 64-byte "frames", every 2nd sampled, ≤4 per
    // item; frame_md5 proves the byte windows are the real payload bytes
    // (fixture text is ASCII, so the oracle's string substr sees the same
    // bytes the engine's binary substr does).
    "q_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.withPayload(
            Tables.table(s, dir, "documents").where(col("doc_id") < 100),
            "doc_id", "text"),
          frameSize = 64, stride = 2, maxFrames = 4)
        .orderBy("doc_id", "frame_idx")),

    // ── Image near-dup via perceptual hash (dHash) over REAL decode ─────
    // The image-dedup stage a multimodal training pipeline runs: each doc
    // gets a deterministic 16×16 h60-noise PNG (ids ≡ 1 mod 25 planted as
    // 3-pixel perturbations of id−1 — Multimodal.NoiseImages), the engine
    // DECODES the actual PNG bytes (javax.imageio), dHashes the decoded
    // raster (9×8 gradient grid → 8 row-bands), and pairs come from the
    // pigeonhole band join (recall-lossless at Hamming ≤ 7, so the
    // brute-force oracle — which replays every pixel analytically — is
    // exactly equal). Planted pairs land at Hamming ≤ 3; independent
    // noise pairs sit near 32 and never appear. Band width is the
    // ADAPTIVE measured-count lever (Multimodal.adaptiveSuperBandBits,
    // r14): ≤2¹⁰ docs join the 8 exact byte-bands; above that the plan
    // switches to 16-bit super-bands + Hamming-1 multiprobe (~30× fewer
    // candidates on noise) — output-invariant either way, so the oracle
    // replays both regimes unchanged.
    "q_image_neardup" -> ((s, dir) =>
      Multimodal.imageNearDups(
          Multimodal.decodeImageDHash(s,
            Multimodal.syntheticNoisePayloads(
              s, Tables.table(s, dir, "documents").select("doc_id"))),
          maxHamming = 7)
        .orderBy("id_a", "id_b")),
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
    // the engine decodes real PNG bytes; the oracle replays the synthetic
    // pixel formula (id mod 13 + 1) × (id mod 7 + 1), v = (id+3x+5y) mod 256
    "q_decode_meta" ->
      """WITH g AS (
           SELECT doc_id, CAST(doc_id % 13 + 1 AS INT) AS width,
                  CAST(doc_id % 7 + 1 AS INT) AS height
           FROM documents),
         px AS (
           SELECT doc_id, width, height,
             unnest(flatten(list_transform(generate_series(0, height - 1), y ->
               list_transform(generate_series(0, width - 1), x ->
                 (doc_id + 3 * x + 5 * y) % 256)))) AS v
           FROM g)
         SELECT doc_id, width, height, CAST(1 AS INT) AS n_channels,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS INT) AS px_min,
           CAST(MAX(v) AS INT) AS px_max,
           ROUND(CAST(SUM(v) AS DOUBLE) / (width * height), 6) AS mean_px
         FROM px GROUP BY doc_id, width, height
         ORDER BY doc_id""",
    "q_resize" ->
      """WITH t AS (
           SELECT doc_id, text, length(text) AS len FROM documents
           WHERE doc_id < 100),
         r AS (
           SELECT doc_id, len,
             array_to_string(list_transform(
               generate_series(0, CAST(ceil(CAST(len AS DOUBLE) / 4) AS INT) - 1),
               i -> substr(text, i * 4 + 1, 1)), '') AS resized
           FROM t)
         SELECT doc_id, CAST(len AS INT) AS orig_bytes,
           CAST(length(resized) AS INT) AS out_bytes,
           md5(resized) AS resized_md5
         FROM r ORDER BY doc_id""",
    "q_frames" ->
      """WITH t AS (
           SELECT doc_id, text, length(text) AS len FROM documents
           WHERE doc_id < 100 AND length(text) > 0),
         n AS (
           SELECT doc_id, text, len,
             CAST(ceil(CAST(len AS DOUBLE) / 64) AS INT) AS total
           FROM t),
         sel AS (
           SELECT doc_id, text, len,
             least(CAST(ceil(CAST(total AS DOUBLE) / 2) AS INT), 4) AS nsel
           FROM n),
         g AS (
           SELECT doc_id, text, len,
             unnest(generate_series(0, nsel - 1)) AS s
           FROM sel)
         SELECT doc_id,
           CAST(s * 2 AS INT) AS frame_idx,
           CAST(s * 2 * 64 AS INT) AS byte_offset,
           CAST(least(64, len - s * 2 * 64) AS INT) AS n_bytes,
           md5(substr(text, CAST(s * 2 * 64 + 1 AS INT), 64)) AS frame_md5
         FROM g ORDER BY doc_id, frame_idx""",
    // the engine dHashes real decoded PNG pixels; the oracle replays the
    // NoiseImages pixel formula (h60 low byte + planted-variant CASE),
    // the 9×8 nearest-neighbor grid ([0,1,3,5,7,8,10,12,14] × even rows),
    // and brute-force band-wise Hamming — exactly equal to the banded
    // engine search because 8-band pigeonhole recall is 1 at ≤ 7.
    "q_image_neardup" ->
      s"""WITH b AS (SELECT doc_id, ${noiseBandsSql} AS bands FROM documents),
         p AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           list_sum(list_transform(generate_series(1,8), i ->
             bit_count(xor(a.bands[i], c.bands[i])))) AS hamming
           FROM b a JOIN b c ON a.doc_id < c.doc_id)
         SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
         FROM p WHERE hamming <= 7 ORDER BY id_a, id_b""",
  )

  /** DuckDB replay of one [[Multimodal.NoiseImages]] pixel: the h60 low
    * byte with the planted-variant CASE (ids ≡ 1 mod 25 take id−1's
    * pixels except where (y·16+x) % 97 == 0). */
  private def noisePxSql(gx: String, gy: String): String = {
    def h(id: String) = "(" + graft.functions.Hashes.h60Sql(
      s"'img:'||CAST($id AS VARCHAR)||':'||CAST($gx AS VARCHAR)" +
        s"||':'||CAST($gy AS VARCHAR)") + " % 256)"
    s"(CASE WHEN doc_id % 25 = 1 AND (($gy) * 16 + ($gx)) % 97 <> 0 " +
      s"THEN ${h("(doc_id - 1)")} ELSE ${h("doc_id")} END)"
  }

  /** The 8 dHash row-bands of a doc's noise image, as a DuckDB list
    * expression (9×8 nearest-neighbor grid over the 16×16 image). */
  private def noiseBandsSql: String =
    s"""list_transform(generate_series(0,7), y ->
          list_sum(list_transform(generate_series(0,7), x ->
            CASE WHEN ${noisePxSql("([0,1,3,5,7,8,10,12,14])[x+2]", "(2*y)")} >
                      ${noisePxSql("([0,1,3,5,7,8,10,12,14])[x+1]", "(2*y)")}
            THEN (1<<x) ELSE 0 END)))"""
}
