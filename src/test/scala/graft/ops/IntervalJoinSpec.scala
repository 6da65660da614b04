package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned interval-overlap join vs the brute range-predicate join, half-open
  * edge semantics, and the ownership-dedup guarantee for multi-bin spans.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def iv(rows: Seq[(Long, String, String)], id: String, st: String,
                 en: String) =
    rows.map { case (i, a, b) => (i, ts(a), ts(b)) }.toDF(id, st, en)

  test("overlapJoin equals brute range join on random intervals, multiple bin widths") {
    val rnd = new scala.util.Random(7)
    // random intervals across ~3 days with lengths from minutes to 8 hours —
    // many span multiple 1h bins, exercising the ownership dedup
    def randIvs(idBase: Long, n: Int) = (0 until n).map { k =>
      val start = rnd.nextInt(3 * 24 * 3600)
      val len = 60 + rnd.nextInt(8 * 3600)
      (idBase + k,
        new java.sql.Timestamp(1700000000000L + start * 1000L),
        new java.sql.Timestamp(1700000000000L + (start + len) * 1000L))
    }
    val a = randIvs(100, 40).toDF("a_id", "a_start", "a_end")
    val b = randIvs(900, 30).toDF("b_id", "b_start", "b_end")
    val brute = a.join(b,
        col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (bin <- Seq(600L, 3600L, 6 * 3600L)) {
      val got = IntervalJoin.overlapJoin(a, b,
          "a_start", "a_end", "b_start", "b_end", binSeconds = bin)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.size === got.toSet.size,
        s"bin=$bin: ownership filter must emit each pair exactly once")
      assert(got.toSet === brute, s"bin=$bin mismatch")
    }
  }

  test("half-open semantics: touching intervals do not match; empty intervals dropped") {
    val a = iv(Seq((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (2L, "2024-01-01 12:00:00", "2024-01-01 12:00:00")), // empty
      "a_id", "a_start", "a_end")
    val b = iv(Seq(
      (10L, "2024-01-01 11:00:00", "2024-01-01 12:00:00"), // touches 1's end
      (11L, "2024-01-01 10:59:59", "2024-01-01 11:30:00"), // overlaps 1s
      (12L, "2024-01-01 11:30:00", "2024-01-01 13:00:00")), // spans 2's instant
      "b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", binSeconds = 3600)
      .select("a_id", "b_id", "overlap_secs")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 11L, 1.0)),
      s"exactly the 1-second genuine overlap, got $got")
  }

  test("overlap_secs is the exact intersection length") {
    val a = iv(Seq((1L, "2024-01-01 10:00:00", "2024-01-01 14:00:00")),
      "a_id", "a_start", "a_end")
    val b = iv(Seq((2L, "2024-01-01 13:30:00", "2024-01-01 18:00:00")),
      "b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", binSeconds = 3600)
      .select("overlap_secs").as[Double].collect()
    assert(got.toSeq === Seq(1800.0))
  }

  test("ambiguous column names are rejected") {
    val a = iv(Seq((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00")),
      "id", "start", "end_")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a, a, "start", "end_", "start", "end_", 3600)
    }
  }
}
