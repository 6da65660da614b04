package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental view maintenance: merge(agg(A), agg(B)) == agg(A ∪ B) for
  * the algebraic kinds, including keys present in only one partial.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def rows = {
    val rnd = new scala.util.Random(17)
    (0 until 500).map { i =>
      (s"k${rnd.nextInt(12)}", i, rnd.nextDouble() * 100)
    }.toDF("k", "id", "v")
  }

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(count(lit(1)).as("cnt"),
      sum(col("v").cast("decimal(28,10)")).as("s"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("cnt"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
      .as[(String, Long, Double, Double, Double)].collect().toSet

  test("merged disjoint partials equal the direct aggregate") {
    val r = rows
    val a = r.where(col("id") % 3 === 0)
    val b = r.where(col("id") % 3 =!= 0)
    val merged = Ivm.mergeAggregates(agg(a), agg(b), Seq("k"), "cnt",
      Seq("s"), Seq("mn"), Seq("mx"))
    assert(canon(merged) === canon(agg(r)))
  }

  test("a key present in only one partial survives the merge unchanged") {
    val a = Seq(("only_a", 1, 5.0), ("both", 2, 1.0)).toDF("k", "id", "v")
    val b = Seq(("both", 3, 2.0)).toDF("k", "id", "v")
    val merged = Ivm.mergeAggregates(agg(a), agg(b), Seq("k"), "cnt",
      Seq("s"), Seq("mn"), Seq("mx"))
    assert(canon(merged) === canon(agg(a.unionByName(b))))
  }

  test("merge is associative: ((A+B)+C) == (A+(B+C)) == direct") {
    val r = rows
    val parts = Seq(0, 1, 2).map(i => agg(r.where(col("id") % 3 === i)))
    def m(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Ivm.mergeAggregates(x, y, Seq("k"), "cnt", Seq("s"), Seq("mn"), Seq("mx"))
    val left = m(m(parts(0), parts(1)), parts(2))
    val right = m(parts(0), m(parts(1), parts(2)))
    val direct = canon(agg(r))
    assert(canon(left) === direct && canon(right) === direct)
  }

  test("empty key list is rejected") {
    intercept[IllegalArgumentException] {
      Ivm.mergeAggregates(agg(rows), agg(rows), Nil, "cnt", Seq("s"))
    }
  }
}
