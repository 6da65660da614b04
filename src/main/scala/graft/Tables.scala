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

  /** `events.parquet` has shipped `ts` two ways across fixture
    * generations, and this reader adapts to both by SCHEMA, not by path:
    *
    *  - nanosecond parquet timestamps, which Spark 4 rejects by default;
    *    session builders set `spark.sql.legacy.parquet.nanosAsLong=true`
    *    (see [[Sessions.builder]]) so the column arrives as raw LONG
    *    nanos, truncated here to microseconds — the same truncation
    *    DuckDB applies, keeping oracle parity. The division must be
    *    integral: long/long in Spark coerces to double, and ns-epoch
    *    values (~1.7e18) exceed double's 2^53 mantissa, silently
    *    corrupting ~12% of values.
    *  - native microsecond timestamps (isAdjustedToUTC=false), which
    *    Spark reads as TIMESTAMP_NTZ directly — no truncation needed
    *    (DuckDB reads the same µs values).
    *
    * Either way the column is surfaced as TIMESTAMP_NTZ (session TZ is
    * UTC) so parquet round-trips compare naive-to-naive.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")) // legacy ns-as-long fixture
      case _ => col("ts") // native µs-timestamp fixture
    }
    raw.withColumn("ts", ts.cast("timestamp_ntz"))
  }
}
