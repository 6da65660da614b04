package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Retrieval]] unit gates: RRF fusion arithmetic and membership on
  * hand-computable rankings, and the diversify suppression semantics
  * (higher-ranked, not kept-higher-ranked) on planted vectors.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse scores union of rankings with per-list reciprocal terms") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> dense), kRrf = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // id 20 is in both lists: 1/62 + 1/61; ids in one list get one term.
    assert(out.keySet == Set(10L, 20L, 30L, 40L))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(20L) == r6(1.0 / 62 + 1.0 / 61))
    assert(out(10L) == r6(1.0 / 61))
    assert(out(30L) == r6(1.0 / 63))
    assert(out(40L) == r6(1.0 / 62))
    // both-lists id outranks every single-list id
    assert(out(20L) > out(10L))
  }

  test("rrfFuse keeps topK and carries per-ranking rank columns") {
    val a = (1 to 30).map(i => (i.toLong, i)).toDF("id", "rank")
    val b = (1 to 30).map(i => (i.toLong, 31 - i)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), topK = 5)
    assert(out.columns.toSeq == Seq("id", "rrf", "a_rank", "b_rank"))
    assert(out.count() == 5)
    // symmetric ranks → rrf maximized at the extremes (rank 1 somewhere)
    val top = out.orderBy(desc("rrf"), col("id")).first()
    assert(top.getAs[Int]("a_rank") == 1 || top.getAs[Int]("b_rank") == 1)
  }

  test("rrfFuse rejects duplicate ranking names") {
    // duplicate names would produce two identically-named <name>_rank
    // columns — ambiguous resolution or silent double-counting (ADVICE r10)
    val a = Seq((1L, 1)).toDF("id", "rank")
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("lex" -> a, "lex" -> a))
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("diversify drops results similar to ANY higher-ranked result") {
    // rank1 = e0; rank2 ≈ e0 (cos≈1, suppressed); rank3 = e1 (kept);
    // rank4 ≈ e1 (suppressed by kept rank3); rank5 ≈ rank2 (suppressed by
    // the SUPPRESSED rank2 — the non-greedy relaxation documented on
    // Retrieval.diversify).
    val v = Map(
      1 -> Array(1f, 0f, 0f, 0f),
      2 -> Array(0.99f, 0.14f, 0f, 0f),
      3 -> Array(0f, 0f, 1f, 0f),
      4 -> Array(0f, 0.14f, 0.99f, 0f),
      5 -> Array(0.98f, 0.2f, 0f, 0f))
    val ranked = v.toSeq.map { case (r, vec) => (r.toLong, r, vec) }
      .toDF("id", "rank", "vec")
    val kept = Retrieval.diversify(ranked, threshold = 0.9)
      .select("rank").as[Int].collect().sorted.toSeq
    assert(kept == Seq(1, 3))
  }

  test("rankOverlap: hand-computed agreement stats, NULL gap on disjoint lists") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 5), (40L, 2)).toDF("id", "rank")
    val r = Retrieval.rankOverlap(a, b)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    // overlap {20, 30}: union 4 ids, gaps |2−1| + |3−5| = 3 → mean 1.5
    assert(r === ((3L, 3L, 2L, 0.5, Some(1.5))))
    val disjoint = Retrieval.rankOverlap(a,
        Seq((77L, 1)).toDF("id", "rank"))
      .as[(Long, Long, Long, Double, Option[Double])].head()
    assert(disjoint === ((3L, 1L, 0L, 0.0, None)),
      "empty overlap: jaccard 0, gap NULL — never a division by zero")
  }

  test("diversify at threshold 1.0+ keeps everything") {
    val ranked = Seq((1L, 1, Array(1f, 0f)), (2L, 2, Array(1f, 0f)))
      .toDF("id", "rank", "vec")
    assert(Retrieval.diversify(ranked, threshold = 1.1).count() == 2)
  }
}
