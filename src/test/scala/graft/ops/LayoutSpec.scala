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
