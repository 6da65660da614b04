package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom runtime-filter semi-join: exactness against the plain semi-join,
  * including under a deliberately undersized filter.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (0L until 5000L).map(i => (i % 700, i)).toDF("k", "row_id")
  private def build = (0L until 50L).map(i => Tuple1(i * 13)).toDF("k")

  test("bloomSemiJoin equals the plain semi-join") {
    val plain = fact.join(build.distinct(), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val got = RuntimeFilter.bloomSemiJoin(fact, build, "k")
      .as[(Long, Long)].collect().toSet
    assert(got === plain)
    assert(plain.nonEmpty && plain.size < 5000, "fixture is selective")
  }

  test("an undersized Bloom stays exact (verify join removes the extra survivors)") {
    val plain = fact.join(build.distinct(), Seq("k"), "left_semi").count()
    val got = RuntimeFilter.bloomSemiJoin(fact, build, "k",
      fpp = 0.5, expectedKeys = 2).count()
    assert(got === plain)
  }

  test("duplicate build keys do not fan out the fact side") {
    val dup = build.unionByName(build)
    val got = RuntimeFilter.bloomSemiJoin(fact, dup, "k").count()
    val plain = fact.join(build.distinct(), Seq("k"), "left_semi").count()
    assert(got === plain)
  }
}
