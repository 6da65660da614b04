package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MERGE INTO kernel — upsert of a change batch into a keyed target,
  * expressed as the one plan shape it always lowers to: a keyed FULL OUTER
  * join with per-side null tests deciding the action. `WHEN MATCHED THEN
  * UPDATE` = both sides present (source values win), `WHEN NOT MATCHED THEN
  * INSERT` = source-only, target-only rows pass through unchanged.
  *
  * One hash exchange per side on the key — the merge costs what any keyed
  * join of |target| + |delta| costs. At 100 TB the target side is the
  * stored table: partition-prune it to the delta's key range first (the
  * same pruning a table format's MERGE does with file-level min/max), and
  * the delta side broadcasts when small. Deletes compose as a source-side
  * tombstone column filtered after the merge.
  *
  * Output: the merged relation (target schema, source values where
  * matched) plus `__action` ∈ {update, insert, keep} — the audit column a
  * MERGE statement's metrics report.
  *
  * Contract: `source` carries the same columns as `target`; `key` is
  * unique per side (enforce upstream — a duplicate source key would
  * fan out the join exactly as MERGE INTO rejects multiple matches).
  */
object Merge {

  def upsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    require(target.columns.sameElements(source.columns),
      s"upsert: schemas differ (${target.columns.toSeq} vs ${source.columns.toSeq})")
    // Side-presence markers, not key null-tests: a NULL-keyed row on
    // EITHER side never matches the equi-join (SQL NULL semantics), so
    // `s.key IS NOT NULL` misreads an unmatched NULL-keyed source row as
    // target-side (emitting all-NULLs labeled 'insert') and the symmetric
    // test misreads a NULL-keyed target row. A literal 1 per side is
    // NULL exactly when that side is absent, regardless of key content.
    val joined = target.withColumn("__t", lit(1)).as("t")
      .join(source.withColumn("__s", lit(1)).as("s"),
        col(s"t.$key") === col(s"s.$key"), "full_outer")
    // Gate on source PRESENCE, not per-column coalesce: SQL MERGE's UPDATE
    // assigns the source value even when it is NULL — coalesce would
    // silently keep the target's old value for an explicit NULL update.
    val merged = target.columns.map(c =>
      when(col("s.__s").isNotNull, col(s"s.$c"))
        .otherwise(col(s"t.$c")).as(c))
    joined.select(merged :+
      when(col("t.__t").isNull, lit("insert"))
        .when(col("s.__s").isNull, lit("keep"))
        .otherwise(lit("update")).as("__action"): _*)
  }
}
