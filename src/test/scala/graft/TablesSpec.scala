package graft

import org.apache.spark.sql.functions._

/** [[Tables.events]] schema-adaptive reader gates: the LongType branch is
  * the legacy ns-as-long fixture path, and its ns-assumption is enforced
  * by magnitude (ADVICE r10) — a fixture shipping µs-as-plain-INT64 must
  * fail the read loudly instead of being silently divided into 1970.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(tsValues: Seq[Long]): String = {
    val dir = tempDir("tables-events").toString
    tsValues.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events LongType branch truncates genuine ns epochs to µs") {
    // 2024-01-01T00:00:00.123456789 in ns
    val ns = 1704067200L * 1000000000L + 123456789L
    val dir = writeEvents(Seq(ns))
    val got = Tables.events(spark, dir).select(col("ts").cast("string"))
      .as[String].collect().head
    assert(got == "2024-01-01 00:00:00.123456")
  }

  test("events LongType branch refuses µs-magnitude values (ADVICE r10)") {
    // the same instant as µs-since-epoch stored as plain INT64 — dividing
    // by 1000 would silently yield 1970; the magnitude guard must raise
    val micros = 1704067200L * 1000000L
    val dir = writeEvents(Seq(micros))
    val e = intercept[Exception] {
      Tables.events(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ns-since-epoch")), msgs(e).mkString(" | "))
  }
}
