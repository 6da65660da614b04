package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table readers (TESTDATA.md / FIXTURES.md §B).
  *
  * All query entry points take a scale-factor directory and read parquet —
  * the engine's scan path is Spark's columnar `FileSourceScanExec`, so column
  * pruning and predicate pushdown reach the footer for free (SURVEY §4).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries nanosecond parquet timestamps, which Spark 4
    * rejects by default. Callers' session builders set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.builder]]) so
    * the column arrives as raw nanos; we truncate to microseconds — the same
    * truncation DuckDB applies, keeping oracle parity. The division must be
    * integral: long/long in Spark coerces to double, and ns-epoch values
    * (~1.7e18) exceed double's 2^53 mantissa, silently corrupting ~12% of
    * values. The column is surfaced as TIMESTAMP_NTZ (session TZ is UTC) so
    * parquet round-trips compare naive-to-naive.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
}
