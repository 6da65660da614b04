package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Direct gates for the native broadcast-sketch predicates: the generated
  * code path must agree with the sketch's own answer row for row (their
  * whole-query behavior is covered by DedupSpec contamination tests and
  * CorpusStatsSpec heavyHitters — this pins the expression itself).
  */
class BloomsSpec extends SparkSpec {
  import spark.implicits._

  test("BloomMightContainLong matches the sketch, codegen and interpreted") {
    val bf = BloomFilter.create(1000, 0.01)
    val inside = (1L to 200L).map(_ * 7919)
    inside.foreach(bf.putLong)
    val bloomB = spark.sparkContext.broadcast(bf)
    val probe = ((1L to 200L).map(_ * 7919) ++ (1L to 200L).map(_ * 104729 + 3))
      .toDF("h")
    val got = probe
      .withColumn("hit", BloomMightContainLong(bloomB)(col("h")))
      .as[(Long, Boolean)].collect().toMap
    got.foreach { case (h, hit) =>
      assert(hit === bf.mightContainLong(h), s"h=$h")
    }
    // no false negatives, ever
    inside.foreach(h => assert(got(h), s"member $h reported absent"))
    // the filter actually prunes: the disjoint probes are mostly misses
    assert(got.count(!_._2) > 150, "fpp 0.01 filter should drop most non-members")
  }

  test("CmsAtLeast matches estimateCount >= threshold; nulls drop in WHERE") {
    val cms = CountMinSketch.create(1e-4, 0.999, 42)
    (1 to 50).foreach(_ => cms.add("hot"))
    (1 to 3).foreach(_ => cms.add("cold"))
    val cmsB = spark.sparkContext.broadcast(cms)
    val toks = Seq(Some("hot"), Some("cold"), Some("absent"), None).toDF("tok")
    val kept = toks.where(CmsAtLeast(cmsB, 10L)(col("tok")))
      .as[Option[String]].collect().toSeq
    assert(kept === Seq(Some("hot")),
      "only the token whose CMS estimate clears the threshold survives; null rows drop")
  }
}
