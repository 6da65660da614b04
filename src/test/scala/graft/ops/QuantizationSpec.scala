package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 embedding quantization: scale definition, code range, the
  * per-dimension reconstruction-error bound, and degenerate inputs.
  */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat)

  private def quantized = {
    val vecs = (1L to 50L).map(i => (i, randVec(16))) :+ (99L, Seq.fill(16)(0f))
    vecs.toDF("vec_id", "embedding")
      .withColumn("scale", Quantization.int8Scale(col("embedding")))
      .withColumn("q", Quantization.quantizeInt8(col("embedding"), col("scale")))
  }

  test("scale is max|x|/127; codes stay in [-127, 127]") {
    val rows = quantized
      .select(col("vec_id"), col("embedding"), col("scale"), col("q"))
      .as[(Long, Seq[Float], Double, Seq[Int])].collect()
    rows.foreach { case (id, v, s, q) =>
      assert(math.abs(s - v.map(x => math.abs(x.toDouble)).max / 127.0) < 1e-15, s"id=$id")
      assert(q.forall(c => c >= -127 && c <= 127), s"id=$id codes out of range")
      assert(q.length === v.length)
    }
  }

  test("reconstruction error ≤ scale/2 per dimension; mse consistent") {
    val rows = quantized
      .select(col("vec_id"), col("scale"),
        Quantization.maxAbsError(col("embedding"), col("q"), col("scale")).as("me"),
        Quantization.mse(col("embedding"), col("q"), col("scale")).as("mse"))
      .as[(Long, Double, Double, Double)].collect()
    rows.foreach { case (id, s, me, mse) =>
      assert(me <= s / 2 + 1e-12, s"id=$id max_err $me > scale/2 ${s / 2}")
      assert(mse >= 0 && mse <= me * me + 1e-12, s"id=$id mse out of range")
    }
  }

  test("all-zero vector: scale 0, all-zero codes, zero error") {
    val r = quantized.where(col("vec_id") === 99L)
      .select(col("scale"), col("q"),
        Quantization.maxAbsError(col("embedding"), col("q"), col("scale")).as("me"))
      .as[(Double, Seq[Int], Double)].head()
    assert(r._1 === 0.0 && r._2.forall(_ == 0) && r._3 === 0.0)
  }

  test("dequantize reproduces the vector within the bound") {
    val rows = quantized
      .select(col("embedding"),
        Quantization.dequantize(col("q"), col("scale")).as("d"), col("scale"))
      .as[(Seq[Float], Seq[Double], Double)].collect()
    rows.foreach { case (v, d, s) =>
      v.zip(d).foreach { case (x, y) =>
        assert(math.abs(x.toDouble - y) <= s / 2 + 1e-12)
      }
    }
  }

  test("pqCodes: codebook members encode to themselves at zero residual") {
    // 16-dim vectors, m=4 subspaces of 4; vectors 0..3 form the codebook
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 12L).map(i =>
      (i, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toSeq.toDF("vec_id", "embedding")
    val got = Quantization.pqCodes(vecs, nCodes = 4, m = 4, dim = 16)
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size === 12)
    // a codebook vector's nearest entry in EVERY subspace is itself → its
    // code string is its own seed index repeated, and the residual is 0
    got.take(4).zipWithIndex.foreach { case ((_, codes, mse), k) =>
      assert(codes === Seq.fill(4)(k.toString).mkString(","),
        s"seed $k must self-encode, got $codes")
      assert(mse === 0.0)
    }
    // non-seed vectors: m codes each in [0, nCodes), strictly positive mse
    got.drop(4).foreach { case (_, codes, mse) =>
      val cs = codes.split(",").map(_.toInt)
      assert(cs.length === 4 && cs.forall(c => c >= 0 && c < 4))
      assert(mse > 0.0)
    }
  }

  test("pqCodes: argmin matches a JVM brute-force over the same codebook") {
    val rnd = new scala.util.Random(29)
    val data = (0L until 10L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val vecs = data.toDF("vec_id", "embedding")
    val got = Quantization.pqCodes(vecs, nCodes = 3, m = 2, dim = 8)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    val cb = data.take(3).map(_._2)
    data.foreach { case (id, v) =>
      val want = (0 until 2).map { s =>
        val xv = v.slice(s * 4, s * 4 + 4).map(_.toDouble)
        (0 until 3).minBy { k =>
          val cv = cb(k).slice(s * 4, s * 4 + 4).map(_.toDouble)
          // same rounded d2 the engine compares (ties impossible here)
          math.round((xv.zip(cv).map { case (x, c) => (x - c) * (x - c) }.sum) * 1e6)
        }
      }.mkString(",")
      assert(got(id) === want, s"vec $id")
    }
  }

  test("pqAdcTopK: approx equals a JVM table-lookup recompute; seed candidates score exactly") {
    val rnd = new scala.util.Random(41)
    val data = (0L until 20L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val vecs = data.toDF("vec_id", "embedding")
    val got = Quantization.pqAdcTopK(
        vecs.where(col("vec_id") < 2), vecs, nCodes = 4, m = 2, dim = 8, k = 5)
      .select("probe_id", "cand_id", "approx_d2", "exact_d2", "rank")
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    assert(got.groupBy(_._1).forall(_._2.size == 5), "k rows per probe")
    // JVM recompute: codes by brute argmin, ADC = sum of LUT entries
    val cb = data.take(4).map(_._2)
    def d2(x: Array[Double], c: Array[Double]) =
      math.round(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum * 1e6) / 1e6
    def subv(v: Array[Float], s: Int) =
      v.slice(s * 4, s * 4 + 4).map(_.toDouble)
    val codeOf = data.map { case (id, v) =>
      id -> (0 until 2).map(s =>
        (0 until 4).minBy(k => (d2(subv(v, s), subv(cb(k), s)), k)))
    }.toMap
    got.foreach { case (p, c, approx, exact, _) =>
      val pv = data(p.toInt)._2
      val want = (0 until 2).map(s =>
        d2(subv(pv, s), subv(cb(codeOf(c)(s)), s))).sum
      assert(math.abs(approx - want) < 1e-9, s"pair ($p,$c)")
      // ground-truth column really is the full-vector exact distance
      val ed = d2(data(p.toInt)._2.map(_.toDouble),
        data(c.toInt)._2.map(_.toDouble))
      assert(math.abs(exact - ed) < 1e-9)
    }
    // a codebook member reconstructs itself → ADC distance to it is exact
    got.filter(r => r._2 < 4).foreach { case (_, _, approx, exact, _) =>
      assert(math.abs(approx - exact) < 1e-9,
        "seed candidates: approx == exact by construction")
    }
    // ranking is by ascending approx distance with cand_id tiebreak
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(r => (r._3, r._2)) ===
        sorted.map(r => (r._3, r._2)).sorted)
    }
  }

  test("ivfPqTopK: cell-routed results equal the full ADC scan restricted to visited cells") {
    // 3 tight clusters on orthogonal axes (16-dim), 24 vectors; seeds =
    // lowest 6 ids (2 per cluster), codebook = lowest 8
    val rnd = new scala.util.Random(5)
    val data = (0L until 24L).map { i =>
      val axis = (i % 3).toInt * 5
      (i, Array.tabulate(16)(j =>
        (if (j == axis) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.05f))
    }
    val vecs = data.toDF("vec_id", "embedding")
    val probes = vecs.where(col("vec_id") < 3)
    val ivf = Quantization.ivfPqTopK(probes, vecs, nSeeds = 6,
        nProbeCells = 2, nCodes = 8, m = 4, dim = 16, k = 4)
      .select("probe_id", "cand_id", "cell", "approx_d2", "rank")
      .as[(Long, Long, Int, Double, Int)].collect().toSeq
    assert(ivf.groupBy(_._1).forall(_._2.size == 4), "k rows per probe")
    // the full (cell-less) ADC scan, same codebook
    val full = Quantization.pqAdcTopK(probes, vecs, nCodes = 8, m = 4,
        dim = 16, k = 24)
      .select("probe_id", "cand_id", "approx_d2")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // every IVF pair's distance equals the full scan's for that pair
    ivf.foreach { case (p, c, _, d, _) =>
      assert(full((p, c)) === d, s"ADC distance drift for ($p,$c)")
    }
    // probes search their own cluster: with tight clusters the top-4 are
    // same-cluster members (cells are cluster-pure by construction)
    ivf.foreach { case (p, c, _, _, _) =>
      assert(c % 3 === p % 3, s"cand $c outside probe $p's cluster")
    }
  }

  test("pqCodes rejects m not dividing dim") {
    val vecs = Seq((0L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Quantization.pqCodes(vecs, nCodes = 1, m = 3, dim = 8)
    }
  }
}
