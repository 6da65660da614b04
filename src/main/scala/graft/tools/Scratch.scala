package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev0.printSchema()
    val ev = ev0.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    ev.printSchema()
    ev.select(col("ts"), window(col("ts"), "1 hour")("start").as("bucket"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("ts").show(3, false)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    emb.printSchema()
    emb.select(col("vec_id"), size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).as("e0")).show(3)
    spark.stop()
  }
}
