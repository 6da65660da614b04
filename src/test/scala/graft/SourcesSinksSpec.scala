package graft

import org.apache.spark.sql.functions._

/** Source/sink breadth (SURVEY §2.2 "Scans/sources" / "Sinks"): the engine
  * reads parquet, CSV, JSON, and text, and round-trips results losslessly —
  * plus the reference's console sink contract (O12, `cell.c:37-39`) and the
  * Scala UDF registration surface (SURVEY §2.2 "UDF/UDAF/UDTF").
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "gamma", 0.0)
  ).toDF("id", "name", "score")

  test("CSV round-trip: write with header, read back with schema") {
    val dir = tempDir("csvrt").resolve("t").toString
    sample.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read.option("header", true)
      .schema("id long, name string, score double").csv(dir)
    assert(back.orderBy("id").collect().toSeq
      === sample.orderBy("id").collect().toSeq)
  }

  test("JSON round-trip: write, read back with schema") {
    val dir = tempDir("jsonrt").resolve("t").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema("id long, name string, score double").json(dir)
    assert(back.orderBy("id").collect().toSeq
      === sample.orderBy("id").collect().toSeq)
  }

  test("ORC round-trip: write, read back") {
    val dir = tempDir("orcrt").resolve("t").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("id").collect().toSeq
      === sample.orderBy("id").collect().toSeq)
  }

  test("parquet round-trip preserves arrays and binary (multimodal columns)") {
    val df = Seq((1L, Array(1f, 2f), "abc".getBytes("UTF-8")))
      .toDF("id", "vec", "payload")
    val dir = tempDir("pqrt").resolve("t").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .as[(Long, Array[Float], Array[Byte])].head()
    assert(back._2.toSeq === Seq(1f, 2f))
    assert(new String(back._3, "UTF-8") === "abc")
  }

  test("console sink renders the reference's exact format (cell.c:38)") {
    val wc = graft.wc.WordCount.fromText(Seq("b a a").toDF("text"), "text")
    assert(graft.wc.WordCount.renderConsole(wc)
      === Seq("Key: a -- Value: 2", "Key: b -- Value: 1"))
  }

  test("typed Dataset view mirrors the reference's cell struct") {
    val wc = graft.wc.WordCount.fromText(Seq("b a a").toDF("text"), "text")
    val ds = graft.wc.WordCount.typed(wc)
    assert(ds.collect().toSeq === Seq(
      graft.wc.WordCount.WordCountRow("a", 2L),
      graft.wc.WordCount.WordCountRow("b", 1L)))
    // typed transforms keep working (map on the case class)
    assert(ds.map(_.cnt).collect().sum === 3L)
  }

  test("Scala UDF registration surface works on the engine session") {
    val squared = udf((x: Long) => x * x)
    spark.udf.register("squared_t", squared)
    assert(sample.select(squared(col("id")).as("s")).as[Long].collect().toSeq
      === Seq(1L, 4L, 9L))
    assert(spark.sql("SELECT squared_t(4) AS s").as[Long].head() === 16L)
  }
}
