package graft

import org.apache.spark.sql.functions._

/** Partition pruning — the data-skipping lever for date/tenant-partitioned
  * 100 TB layouts: a filter on the partition column must reach the scan as
  * a PartitionFilter (directories never listed), not a post-scan Filter.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("filter on the partition column prunes partitions at the scan") {
    val dir = tempDir("parted").resolve("t").toString
    (0 until 1000).map(i => (i % 7, i.toLong, s"row$i"))
      .toDF("day", "id", "payload")
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).where(col("day") === 3)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString

    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      s"day=3 must be a partition filter:\n$scan")
    // only the day=3 directory's rows are read
    assert(q.count() === (0 until 1000).count(_ % 7 == 3))
    // and the pushed-down column filter path still works alongside
    val q2 = spark.read.parquet(dir)
      .where(col("day") === 3 && col("id") < 100)
    assert(q2.queryExecution.executedPlan.collectLeaves().head.toString
      .contains("PushedFilters: [IsNotNull(id), LessThan(id,100)]"))
  }
}
