package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiler: per-channel stats on a frame with planted
  * nulls and duplicates, and the approx-ndv scale switch.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(2.5), Some("b"), Some("2024-01-01 10:00:00")),
    (2L, Some(2.5), Some("a"), Some("2024-01-02 10:00:00")),
    (3L, None, Some("c"), None),
    (4L, Some(7.0), None, Some("2024-01-03 10:00:00.123456")))
    .toDF("k", "v", "s", "t0")
    .withColumn("t", col("t0").cast("timestamp")).drop("t0")

  test("columnStats: counts, nulls, ndv, typed min/max per channel") {
    val got = Profile.columnStats(df,
        numCols = Seq("k", "v"), strCols = Seq("s"), tsCols = Seq("t"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])]
      .collect().toSeq
    val byName = got.map(r => r._1 -> r).toMap
    assert(got.map(_._1) === Seq("k", "s", "t", "v"))
    assert(got.forall(_._2 == 4L), "n_rows is the table count on every row")
    assert(byName("k") === (("k", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None)))
    assert(byName("v") === (("v", 4L, 1L, 2L, Some(2.5), Some(7.0), None, None)),
      "ndv ignores nulls and collapses the duplicate 2.5")
    assert(byName("s") === (("s", 4L, 1L, 3L, None, None, Some("a"), Some("c"))))
    val t = byName("t")
    assert((t._2, t._3, t._4) === ((4L, 1L, 3L)))
    // epoch seconds carry the exact microsecond fraction
    val expectMax = java.sql.Timestamp.valueOf("2024-01-03 10:00:00.123456")
      .toInstant
    val gotMax = t._6.get
    assert(gotMax === expectMax.getEpochSecond +
      expectMax.getNano / 1000 / 1000000.0)
    assert((t._7, t._8) === ((None, None)))
  }

  test("approx ndv switch (the 100 TB form) agrees on tiny cardinalities") {
    val exact = Profile.columnStats(df, Seq("k"), Seq("s"), Seq())
      .select("col_name", "ndv").as[(String, Long)].collect().toMap
    val approx = Profile.columnStats(df, Seq("k"), Seq("s"), Seq(),
        exactNdv = false)
      .select("col_name", "ndv").as[(String, Long)].collect().toMap
    assert(approx === exact, "HLL is exact at cardinality ≤ 4")
  }

  test("equiDepthHistogram: near-equal counts, contiguous ranges, ntile remainder rule") {
    // 23 rows in one group: ntile(4) → buckets of 6,6,6,5 (remainder to
    // the FIRST buckets), values 1..23 in order
    val rows = (1 to 23).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "v", "id")
    val got = Profile.equiDepthHistogram(rows, "grp", "v", "id", buckets = 4)
      .orderBy("bucket")
      .select("bucket", "n", "lo", "hi")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1, 6L, 1L, 6L), (2, 6L, 7L, 12L),
      (3, 6L, 13L, 18L), (4, 5L, 19L, 23L)))
    // duplicate values split deterministically by the id tiebreak
    val dup = (1 to 8).map(i => ("g", 5L, i.toLong)).toDF("grp", "v", "id")
    val d = Profile.equiDepthHistogram(dup, "grp", "v", "id", buckets = 2)
      .select("bucket", "n").as[(Int, Long)].collect().toSeq.sorted
    assert(d === Seq((1, 4L), (2, 4L)))
  }

  test("empty or duplicate column lists are rejected") {
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, Seq(), Seq(), Seq())
    }
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, Seq("k"), Seq("k"), Seq())
    }
  }
}
