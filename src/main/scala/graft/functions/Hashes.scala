package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * The natural Spark choices (`hash` = Murmur3, `xxhash64`) are fast but
  * engine-private: no other SQL engine reproduces them, so every pipeline
  * built on them (minhash signatures, LSH buckets, fingerprints) becomes
  * unverifiable against an independent oracle. We standardize on a 60-bit
  * integer derived from md5 — md5 is bit-identical in every engine, and 15
  * hex digits (60 bits) fit a signed 64-bit integer with headroom.
  *
  *   Spark :  conv(substr(md5(s), 1, 15), 16, 10)  :: long
  *   DuckDB:  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
  *
  * md5 costs ~10× a Murmur3 per call; for the 100 TB path the call sites
  * are all post-tokenization (per shingle, not per byte) and stay inside
  * whole-stage codegen, so the cost is a constant factor on the narrow
  * pre-shuffle stage, not a new boundary. Swap [[h60]]'s body for
  * `xxhash64` if oracle portability ever stops mattering.
  */
object Hashes {

  /** 60-bit hash of a string column (non-negative, stable across engines). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[h60]] for oracle SQL construction. */
  def h60Sql(inner: String): String =
    s"CAST(('0x'||substr(md5($inner),1,15)) AS BIGINT)"
}
