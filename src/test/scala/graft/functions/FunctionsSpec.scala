package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-decimal aggregation helpers and the engine-portable h60 hash. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("exactSum is independent of partitioning / merge order") {
    // doubles chosen so naive fp summation differs by order
    val vals = Seq.tabulate(1000)(i => 0.1 + i * 1e-7)
    val expected = vals.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    val sums = Seq(1, 3, 8).map { n =>
      vals.toDF("v").repartition(n)
        .agg(Exact.exactSum(col("v")).as("s")).as[Double].head()
    }
    assert(sums.distinct.size === 1)
    assert(math.abs(sums.head - expected.toDouble) < 1e-9)
  }

  test("roundAvg ignores NULL rows in the denominator (ADVICE r02)") {
    val df = Seq[Option[Double]](Some(1.0), Some(2.0), None, Some(3.0), None)
      .toDF("v")
    val avg = df.agg(Exact.roundAvg(col("v")).as("a")).as[Double].head()
    assert(avg === 2.0) // (1+2+3)/3, not /5
  }

  test("longSum sums integral-valued doubles exactly") {
    val s = Seq(1.0, 2.0, 3.0).toDF("v")
      .agg(Exact.longSum(col("v")).as("s")).as[Long].head()
    assert(s === 6L)
  }

  test("h60 equals the first 15 hex digits of md5, as a non-negative long") {
    val inputs = Seq("", "a", "hello world", "東京", "x" * 1000)
    val got = inputs.toDF("s").select(Hashes.h60(col("s"))).as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    inputs.zip(got).foreach { case (in, h) =>
      val hex = md.digest(in.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      assert(h === java.lang.Long.parseLong(hex.take(15), 16), s"input '$in'")
      assert(h >= 0L)
    }
  }

  test("h60 is stable across calls") {
    val df = Seq("tok").toDF("s")
    val h1 = df.select(Hashes.h60(col("s"))).as[Long].head()
    val h2 = df.select(Hashes.h60(col("s"))).as[Long].head()
    assert(h1 === h2)
  }
}
