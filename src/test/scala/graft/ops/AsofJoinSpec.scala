package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: most-recent-at-or-before match, per-key isolation,
  * null for unmatched, and agreement with the naive O(L·R) formulation.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, label)
  private def left = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-early"),
    (2L, 15L, "l-c"),
    (3L, 50L, "l-nomatch")
  ).toDF("k", "t", "label")

  // (key, time, value) — key 3 has no rows at all ≤ 50 except... none
  private def right = Seq(
    (1L, 8L, 100.0), (1L, 20L, 200.0), (1L, 30L, 300.0),
    (2L, 1L, 400.0),
    (3L, 60L, 500.0) // after the left row → must not match
  ).toDF("k", "t", "v")

  test("asof: latest right value at-or-before each left time, null if none") {
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("label", "asof_v")
      .as[(String, Option[Double])].collect().toMap
    assert(got("l-a") === Some(100.0))     // 8 ≤ 10, latest
    assert(got("l-b") === Some(200.0))     // tie t=20: <= semantics, right visible
    assert(got("l-early") === None)        // nothing at or before 5
    assert(got("l-c") === Some(400.0))     // cross-key isolation
    assert(got("l-nomatch") === None)      // right row is in the future
  }

  test("nearest: min |Δt| in either direction, ties backward, none when empty") {
    // key 1 rights at 8, 20, 30; key 3's only right is at 60 (future —
    // nearest must still take it, FORWARD); key 4 has no rights at all
    val l4 = left.unionByName(Seq((4L, 99L, "l-norights"))
      .toDF("k", "t", "label"))
    val got = AsofJoin.asofJoinNearest(l4, right, "k", "t", "t", Seq("v"))
      .select("label", "nearest_v", "nearest_dt_us", "nearest_dir")
      .as[(String, Option[Double], Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("l-a") === ((Some(100.0), 2L, "backward"))) // 8 beats 20 (|2|<|10|)
    assert(got("l-b") === ((Some(200.0), 0L, "backward"))) // exact tie at 20
    assert(got("l-early") === ((Some(100.0), 3L, "forward"))) // 8 is ahead
    assert(got("l-c") === ((Some(400.0), 14L, "backward")))
    assert(got("l-nomatch") === ((Some(500.0), 10L, "forward"))) // future-only
    assert(got("l-norights") === ((None, -1L, "none")))
  }

  test("nearest: equidistant candidates resolve to the backward match") {
    val l = Seq((1L, 10L, "mid")).toDF("k", "t", "label")
    val r = Seq((1L, 7L, 1.0), (1L, 13L, 2.0)).toDF("k", "t", "v")
    val got = AsofJoin.asofJoinNearest(l, r, "k", "t", "t", Seq("v"))
      .select("nearest_v", "nearest_dt_us", "nearest_dir")
      .as[(Double, Long, String)].head()
    assert(got === ((1.0, 3L, "backward")))
  }

  test("asof tolerance: stale matches rejected, fresh carried, lag exact") {
    val l2 = left.withColumn("ts", timestamp_seconds(col("t")))
    val r2 = right.withColumn("ts", timestamp_seconds(col("t")))
    val got = AsofJoin
      .asofJoinTolerance(l2, r2, "k", "ts", "ts", Seq("v"), 5L * 1000000L)
      .select("label", "asof_v", "asof_matched", "asof_lag_us")
      .as[(String, Option[Double], Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("l-a") === ((Some(100.0), true, 2000000L))) // lag 2s ≤ 5s
    assert(got("l-b") === ((Some(200.0), true, 0L)))       // tie: lag 0
    assert(got("l-early") === ((None, false, -1L)))        // no match at all
    assert(got("l-c") === ((None, false, -1L)))            // lag 14s: STALE
    assert(got("l-nomatch") === ((None, false, -1L)))
  }

  test("asof tolerance on numeric-micros time columns (no timestamp cast)") {
    // same rows, times already in micros: t·10⁶
    val l2 = left.withColumn("tus", col("t") * 1000000L)
    val r2 = right.withColumn("tus", col("t") * 1000000L)
    val got = AsofJoin
      .asofJoinTolerance(l2, r2, "k", "tus", "tus", Seq("v"), 5L * 1000000L)
      .select("label", "asof_matched")
      .as[(String, Boolean)].collect().toMap
    assert(got === Map("l-a" -> true, "l-b" -> true, "l-early" -> false,
      "l-c" -> false, "l-nomatch" -> false))
  }

  test("asof preserves every left row exactly once and all left columns") {
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
    assert(out.count() === left.count())
    assert(out.columns.toSet === Set("k", "t", "label", "asof_v"))
  }

  test("asof agrees with the naive join+argmax formulation on random data") {
    val rnd = new scala.util.Random(99)
    val l = Seq.tabulate(200)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "t", "v")
      // contract: unique (k, t) on the right
      .groupBy("k", "t").agg(max("v").as("v"))
    val fast = AsofJoin.asofJoin(l, r, "k", "t", "t", Seq("v"))
      .select(col("lid"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toMap
    val naive = l.as("l")
      .join(r.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("lid"))
      .agg(max_by(col("r.v"), col("r.t")).as("v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(fast === naive)
  }

  test("a matched right row with NULL payload yields NULL, not a stale older value") {
    val r = Seq((1L, 10L, Some(5.0)), (1L, 20L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val l = Seq((1L, 25L, "x")).toDF("k", "t", "label")
    val got = AsofJoin.asofJoin(l, r, "k", "t", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(got === None, "the t=20 row matches; its NULL must carry, not t=10's 5.0")
  }

  test("multiple right values carry together") {
    val r2 = Seq((1L, 8L, 100.0, "a"), (1L, 15L, 150.0, "b"))
      .toDF("k", "t", "v", "s")
    val got = AsofJoin.asofJoin(left, r2, "k", "t", "t", Seq("v", "s"))
      .where(col("label") === "l-b")
      .select("asof_v", "asof_s").as[(Double, String)].head()
    assert(got === ((150.0, "b")))
  }
}
