package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order interleave correctness and the bucket-locality property the
  * data-skipping audit rides on.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue equals a JVM Morton interleave, exhaustively at 4 bits") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    val rows = for { a <- 0L until 16L; b <- 0L until 16L } yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === morton(a, b, 4), s"($a,$b)") }
    // bijective on the 4-bit grid
    assert(got.map(_._3).distinct.length === 256)
  }

  test("ensurePartitioned re-derives when the source fingerprint moves") {
    // ADVICE r16: the _SUCCESS-only check served stale derived copies
    // after an in-place fixture regeneration — the fingerprint stamp must
    // force a re-derive on mismatch and skip the write on match
    val dir = tempDir("fpderive")
    val src = dir.resolve("src.parquet").toString
    val derived = dir.resolve("derived").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "part")
      .write.parquet(src)
    val fp1 = Layout.srcFingerprint(src)
    Layout.ensurePartitioned(spark.read.parquet(src), derived, "part", fp1)
    assert(spark.read.parquet(derived).count() === 2)
    // same fingerprint → served as-is (marker intact, no rewrite): prove
    // it by NOT giving the by-name df a usable plan the second time
    Layout.ensurePartitioned(
      sys.error("must not re-derive on a matching fingerprint"),
      derived, "part", fp1)
    // "regenerate" the source with different contents
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "part")
      .write.mode("overwrite").parquet(src)
    val fp2 = Layout.srcFingerprint(src)
    assert(fp2 !== fp1, "regeneration must move the fingerprint")
    Layout.ensurePartitioned(spark.read.parquet(src), derived, "part", fp2)
    assert(spark.read.parquet(derived).count() === 3,
      "stale derived copy served after source regeneration")
  }

  test("zOrderStats: every bucket's spans are bounded by its curve segment") {
    // 2^5 × 2^5 grid, bucketShift 6 → each bucket is a 16-cell Morton
    // segment = a 4×4 tile: spans ≤ 3 on BOTH dimensions — the locality a
    // plain sort on one key cannot give the other
    val rows = for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b)
    val stats = Layout.zOrderStats(rows.toDF("a", "b"), "a", "b",
        bits = 5, bucketShift = 4)
      .select("bucket", "n", "span_a", "span_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats.map(_._2).sum === 1024L)
    stats.foreach { case (bk, n, sa, sb) =>
      assert(n === 16L, s"bucket $bk size")
      assert(sa <= 3 && sb <= 3, s"bucket $bk spans ($sa, $sb)")
    }
  }
}
