package graft

import org.apache.spark.sql.functions._

/** Partition pruning — the data-skipping lever for date/tenant-partitioned
  * 100 TB layouts: a filter on the partition column must reach the scan as
  * a PartitionFilter (directories never listed), not a post-scan Filter.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  // Files.list holds a directory fd until closed (ADVICE r17: the shared
  // test JVM leaked one per month-dir probe) — count under try/finally.
  private def countEntries(d: java.nio.file.Path,
                           keep: java.nio.file.Path => Boolean): Long = {
    if (!java.nio.file.Files.isDirectory(d)) 0L
    else {
      val s = java.nio.file.Files.list(d)
      try s.filter(p => keep(p)).count()
      finally s.close()
    }
  }

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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the star-schema 100 TB lever the static test can't cover: the
    // selective predicate sits on the DIMENSION (tag = 3), the fact is
    // partitioned by the JOIN key (day), and no literal day filter
    // exists at plan time — DPP must inject a runtime
    // DynamicPruningExpression into the fact scan's PartitionFilters
    // (reusing the dim's broadcast), so only the matching day
    // directories' files are ever read
    val dir = tempDir("dpp")
    (0 until 30).flatMap(d => (0 until 200).map(i => (d, d * 1000L + i)))
      .toDF("day", "id")
      .repartition(col("day")) // one file per partition dir → exact numFiles
      .write.partitionBy("day").parquet(dir.resolve("fact").toString)
    (0 until 30).map(d => (d, d % 10)).toDF("day", "tag")
      .write.parquet(dir.resolve("dim").toString)
    val fact = spark.read.parquet(dir.resolve("fact").toString)
    val dim = spark.read.parquet(dir.resolve("dim").toString)

    val q = fact.join(dim, Seq("day")).where(col("tag") === 3)
      .agg(count(lit(1)).as("n"))
    val n = q.collect().head.getLong(0)
    assert(n === 3L * 200, s"days {3,13,23} × 200 rows: $n")

    val scans = collectPlanNodes(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("fact")) => f
    }
    assert(scans.nonEmpty, "fact scan not found in the executed plan")
    val scanStr = scans.head.toString
    assert(scanStr.contains("dynamicpruning"),
      s"fact PartitionFilters must carry a DynamicPruningExpression:\n$scanStr")
    // the runtime proof: only the 3 matching partition directories' files
    // were read (30 written, 1 file each)
    val filesRead = scans.head.metrics("numFiles").value
    assert(filesRead === 3L,
      s"DPP should read 3 of 30 partition files, read $filesRead")
  }

  test("q_star_dpp (gated surface): runtime pruning fires on the partitioned fact") {
    // VERDICT r15 #4: the mechanism gate above proves DPP on a synthetic
    // pair; this pins it on the ORACLE-GATED query — the month-partitioned
    // lineitem copy joined through the orders month dimension must read
    // only Q2-1997's three ship_month directories at runtime.
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_star_dpp")(spark, dir)
    val rows = q.collect()
    assert(rows.length === 3, s"Q2-1997 = 3 ship months, got ${rows.length}")
    val scans = collectPlanNodes(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("dpp_lineitem")) => f
    }
    assert(scans.nonEmpty, "partitioned fact scan not found")
    val scanStr = scans.head.toString
    assert(scanStr.contains("dynamicpruning"),
      s"fact PartitionFilters must carry a DynamicPruningExpression:\n" +
        scanStr.take(800))
    // runtime file-count proof: exactly the files under the 3 matching
    // month directories were opened (total span is ~80 months)
    val root = java.nio.file.Paths.get(
      s"target/fixtures/dpp_lineitem_sf0.001")
    def filesIn(month: String): Long =
      countEntries(root.resolve(s"ship_month=$month"),
        _.toString.endsWith(".parquet"))
    val expected = Seq("1997-04", "1997-05", "1997-06").map(filesIn).sum
    val totalDirs = countEntries(root,
      _.getFileName.toString.startsWith("ship_month="))
    assert(totalDirs > 10, s"expected many month dirs, got $totalDirs")
    val filesRead = scans.head.metrics("numFiles").value
    assert(filesRead === expected && expected > 0,
      s"DPP should read the $expected files of the 3 matching dirs " +
        s"(of $totalDirs dirs), read $filesRead")
  }

  test("q_star_dpp_in (gated surface): left-semi subquery-IN topology prunes at runtime") {
    // VERDICT r16 #7: the second join topology — WHERE ship_month IN
    // (SELECT ...) plans as a LEFT SEMI join, and DPP's join-type rule
    // must still inject the runtime partition filter into the fact scan.
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_star_dpp_in")(spark, dir)
    val rows = q.collect()
    assert(rows.length === 3, s"urgent 1996-Q3 = 3 ship months, got ${rows.length}")
    val plan = q.queryExecution.executedPlan
    // topology proof: the pruning join IS a semi join, not the inner
    // dim join q_star_dpp covers
    assert(collectPlanNodes(plan).exists(n =>
      n.toString.contains("LeftSemi")),
      "the IN-subquery must plan as a left-semi join")
    val scans = collectPlanNodes(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("dpp_lineitem")) => f
    }
    assert(scans.nonEmpty, "partitioned fact scan not found")
    assert(scans.head.toString.contains("dynamicpruning"),
      s"fact PartitionFilters must carry a DynamicPruningExpression:\n" +
        scans.head.toString.take(800))
    val root = java.nio.file.Paths.get(
      s"target/fixtures/dpp_lineitem_sf0.001")
    def filesIn(month: String): Long =
      countEntries(root.resolve(s"ship_month=$month"),
        _.toString.endsWith(".parquet"))
    val expected = Seq("1996-07", "1996-08", "1996-09").map(filesIn).sum
    val filesRead = scans.head.metrics("numFiles").value
    assert(filesRead === expected && expected > 0,
      s"left-semi DPP should read the $expected files of the 3 matching " +
        s"month dirs, read $filesRead")
  }
}
