package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native sketch expressions: generated-code results vs plain-JVM reference
  * implementations, null/empty contracts, and family determinism.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private val arrays: Seq[Seq[Long]] =
    Seq(Seq(0L), Seq((1L << 60) - 1), Seq.fill(100)(rnd.nextLong() & Sketches.Mask60),
      Seq.fill(3)(12345L), (1L to 50L).toSeq)

  private def simhashRef(hs: Seq[Long]): Long = {
    val cnt = new Array[Int](60)
    hs.foreach { h =>
      (0 until 60).foreach(j => cnt(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
    }
    (0 until 60).foldLeft(0L)((acc, j) => if (cnt(j) > 0) acc | (1L << j) else acc)
  }

  private def minhashRef(hs: Seq[Long], k: Int): Seq[Long] =
    (0 until k).map { j =>
      hs.map(h => (Sketches.affineA(j) * h + Sketches.affineB(j)) & Sketches.Mask60).min
    }

  test("simhash60 codegen output matches the JVM reference on random inputs") {
    val got = arrays.toDF("hs")
      .select(call_function("simhash60", col("hs"))).as[Long].collect().toSeq
    assert(got === arrays.map(simhashRef))
  }

  test("minhash_sig codegen output matches the JVM reference; empty → null") {
    val got = arrays.toDF("hs")
      .select(call_function("minhash_sig", col("hs"), lit(7)))
      .as[Seq[Long]].collect().toSeq
    assert(got === arrays.map(minhashRef(_, 7)))
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(call_function("minhash_sig", col("hs"), lit(7))).collect()
    assert(empty.head.isNullAt(0))
  }

  test("affine family: permutations differ per index and stay in [0, 2^60)") {
    val hs = arrays(2)
    val sigs = (0 until 16).map(j => minhashRef(hs, 16)(j))
    assert(sigs.distinct.size > 12, "independent-ish permutations")
    sigs.foreach(v => assert(v >= 0 && v <= Sketches.Mask60))
  }

  private def winnowRef(hs: Seq[Long], w: Int): Seq[Long] =
    if (hs.length < w) Seq.empty
    else hs.sliding(w).map(_.min).toSeq.distinct.sorted

  test("winnow_mins codegen output matches the JVM reference; short input → empty") {
    for (w <- Seq(1, 2, 4, 7)) {
      val got = arrays.toDF("hs")
        .select(call_function("winnow_mins", col("hs"), lit(w)))
        .as[Seq[Long]].collect().toSeq
      assert(got === arrays.map(winnowRef(_, w)), s"w=$w")
    }
    // fewer elements than the window → empty set, not null
    val short = Seq(Seq(1L, 2L)).toDF("hs")
      .select(call_function("winnow_mins", col("hs"), lit(4)))
      .as[Seq[Long]].collect().head
    assert(short === Seq.empty)
  }

  test("winnow_mins density: ~2/(w+1) of positions on random input") {
    // the winnowing density bound (Schleimer et al. §4): expected
    // fingerprint fraction 2/(w+1); allow a generous band on 10k hashes
    val hs = Seq.fill(10000)(rnd.nextLong() & Sketches.Mask60)
    val w = 4
    val n = Seq(hs).toDF("hs")
      .select(size(call_function("winnow_mins", col("hs"), lit(w))))
      .as[Int].collect().head
    val frac = n.toDouble / hs.size
    assert(frac > 0.25 && frac < 0.55, s"density $frac vs expected ~0.4")
  }

  test("sketch expressions reject non-long-array input at analysis time") {
    val e = intercept[Exception] {
      Seq(Seq("a")).toDF("hs")
        .select(call_function("simhash60", col("hs"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
  }
}
