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
}
