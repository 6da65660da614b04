package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join / salted aggregation: result-equivalence with the plain
  * forms on a deliberately skewed key distribution.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share key 0 (the hot key), the rest spread over 1-9
  private def fact = (0 until 2000).map { i =>
    (if (i % 10 == 0) (i / 10) % 9 + 1 else 0L, i.toLong, i * 1.5)
  }.toDF("k", "row_id", "v")
  private def dim = (0L to 9L).map(k => (k, s"dim-$k")).toDF("k", "label")

  test("saltedJoin equals the plain join on skewed data") {
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "label").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", col("row_id"), salts = 8)
      .select("row_id", "label").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 2000, "dim is unique per key — row count preserved")
  }

  test("saltedJoin with salts=1 degenerates to the plain join") {
    val plain = fact.join(dim, Seq("k")).count()
    assert(Skew.saltedJoin(fact, dim, "k", col("row_id"), 1).count() === plain)
  }

  test("salted partial aggregation spreads the hot key and sums exactly") {
    val got = Skew.saltedCount(fact, "k", col("row_id"), salts = 8)
      .as[(Long, Long)].collect().toMap
    val exp = fact.groupBy("k").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    assert(got === exp)
    assert(exp(0L) === 1800L, "fixture really is skewed")
  }
}
