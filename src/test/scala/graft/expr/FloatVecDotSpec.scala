package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen expression: value correctness (vs a JVM-side loop), null
  * propagation, length-mismatch prefix rule, type checking, and SQL-surface
  * registration via GraftExtensions.
  */
class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  test("dot value matches a plain JVM loop, including empty vectors") {
    val data = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(0.5f), Array(-0.5f)))
    val got = data.toDF("a", "b")
      .select(call_function("float_vec_dot", col("a"), col("b")))
      .as[Double].collect()
    data.zip(got).foreach { case ((a, b), d) =>
      val exp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(d - exp) < 1e-12)
    }
  }

  test("mismatched lengths take the common prefix") {
    val d = Seq((Array(1f, 2f, 99f), Array(3f, 4f))).toDF("a", "b")
      .select(call_function("float_vec_dot", col("a"), col("b")))
      .as[Double].head()
    assert(d === 1.0 * 3 + 2.0 * 4)
  }

  test("null input propagates to null output") {
    val row = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(call_function("float_vec_dot", col("a"), col("b")))
      .collect().head
    assert(row.isNullAt(0))
  }

  test("non-float-array arguments are rejected at analysis time") {
    val e = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .select(call_function("float_vec_dot", col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("registered in SQL via GraftExtensions (spark.sql surface)") {
    val d = spark.sql(
      "SELECT float_vec_dot(array(cast(1 as float), cast(2 as float)), " +
        "array(cast(3 as float), cast(4 as float))) AS d")
      .as[Double].head()
    assert(d === 11.0)
  }
}
