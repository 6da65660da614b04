package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE INTO kernel: action classification, source-wins assignment (incl.
  * explicit NULL updates), and pass-through of unmatched target rows.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("upsert: matched rows take source values, new keys insert, rest keep") {
    val source = Seq(
      (2L, "b2", 99.0),   // update
      (9L, "z", 1.0))     // insert
      .toDF("k", "name", "v")
    val got = Merge.upsert(target, source, "k")
      .select("k", "name", "v", "__action")
      .as[(Long, String, Double, String)].collect().toSet
    assert(got === Set(
      (1L, "a", 10.0, "keep"),
      (2L, "b2", 99.0, "update"),
      (3L, "c", 30.0, "keep"),
      (9L, "z", 1.0, "insert")))
  }

  test("empty source leaves the target untouched (all keep)") {
    val got = Merge.upsert(target, target.where(lit(false)), "k")
      .select("k", "__action").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "keep"), (2L, "keep"), (3L, "keep")))
  }

  test("explicit NULL in the source updates the column to NULL (MERGE semantics)") {
    val source = Seq((2L, Option.empty[String], Option(99.0)))
      .toDF("k", "name", "v")
    val got = Merge.upsert(target, source, "k")
      .select("k", "name", "v", "__action")
      .as[(Long, Option[String], Option[Double], String)].collect().toSet
    assert(got === Set(
      (1L, Some("a"), Some(10.0), "keep"),
      (2L, None, Some(99.0), "update"),   // source NULL wins, not coalesced away
      (3L, Some("c"), Some(30.0), "keep")))
  }

  test("NULL-keyed rows on either side pass through as themselves (never match)") {
    // SQL NULL never equi-matches: a NULL-keyed source row is an insert
    // carrying ITS values; a NULL-keyed target row is a keep. The
    // presence-marker gate must not misread either as the other side.
    val tgt = Seq((Option(1L), Option("a")), (Option.empty[Long], Option("tnull")))
      .toDF("k", "name")
    val src = Seq((Option.empty[Long], Option("snull")), (Option(9L), Option("z")))
      .toDF("k", "name")
    val got = Merge.upsert(tgt, src, "k")
      .select("k", "name", "__action")
      .as[(Option[Long], Option[String], String)].collect().toSet
    assert(got === Set(
      (Some(1L), Some("a"), "keep"),
      (None, Some("tnull"), "keep"),
      (None, Some("snull"), "insert"),
      (Some(9L), Some("z"), "insert")))
  }

  test("schema mismatch is rejected") {
    intercept[IllegalArgumentException] {
      Merge.upsert(target, target.select("k", "name"), "k")
    }
  }
}
