package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates — the engine's pluggable-aggregation extension
  * point, the direct analogue of the reference's `item` interface
  * (`item.h:4-8`: any key-value struct with compare/update/copy plugs into
  * the map machinery; `update_struct` ≙ [[Aggregator.reduce]]/
  * [[Aggregator.merge]]). `Aggregator[IN, BUF, OUT]` gives the same
  * contract with Tungsten-encoded buffers and partial/final phases handled
  * by HashAggregateExec — merge MUST be commutative+associative, exactly
  * like the reference's sum-merge (`cell.c:10-15`).
  */
object Aggregators {

  /** Root-mean-square of an integral-valued double column. The buffer is
    * (count, Σx²) in exact longs, so partial/final merge order cannot
    * change the result — the sqrt/divide happen once, at the edge.
    */
  object Rms extends Aggregator[Double, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), x: Double): (Long, Long) = {
      val v = x.toLong
      (b._1 + 1, b._2 + v * v)
    }
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double =
      if (b._1 == 0) 0.0
      else BigDecimal(math.sqrt(b._2.toDouble / b._1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form of [[Rms]] for untyped `agg(...)` call sites. */
  def rms(c: Column): Column = udaf(Rms).apply(c)
}
