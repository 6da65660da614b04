package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a NATIVE, codegen-friendly predicate.
  *
  * Why not a Scala UDF (measured, bench r9 at sf0.1): the Bloom pre-pass
  * of the decontamination family filters the EXPLODED corpus n-gram
  * stream — corpus-scale rows — and a UDF there breaks the whole-stage
  * codegen span around the explode+filter, adds per-row boxing, and cost
  * q_decontam_bloom ~2.2× its exact twin; with the filter generated
  * inline the stage stays fused. The broadcast handle rides the
  * expression into the generated code via `addReferenceObj`, so the
  * sketch is deserialized once per executor, not referenced per row.
  *
  * Unlike the registry-backed expressions in [[Sketches]], this one
  * carries a runtime object (the broadcast filter), so it is constructed
  * directly at the call site (`ExpressionUtils.column`), never through
  * the SQL function registry.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${t.sql}")
  }

  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val broadcastCls = classOf[Broadcast[_]].getName
    val bloomCls = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBroadcast", bloom, broadcastCls)
    // per-partition-constant: pull .value() out of the row loop
    val filter = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"$v = ($bloomCls) $ref.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $filter.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-level constructor: `mightContain(bloomB)(col("h"))`. */
  def apply(bloom: Broadcast[BloomFilter])(h: Column): Column =
    ColumnBridge.column(
      new BloomMightContainLong(ColumnBridge.expression(h), bloom))
}

/** `cms.estimateCount(child) >= threshold` as a native codegen'd
  * predicate over a STRING column — the Count-Min-Sketch candidate
  * filter of [[graft.ops.CorpusStats.heavyHitters]], which runs on the
  * corpus-scale token stream and must not break the fused stage (same
  * rationale as [[BloomMightContainLong]]).
  */
case class CmsAtLeast(child: Expression,
                      cms: Broadcast[org.apache.spark.util.sketch.CountMinSketch],
                      threshold: Long)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def prettyName: String = "cms_at_least"

  override protected def nullSafeEval(input: Any): Any =
    cms.value.estimateCount(input.toString) >= threshold

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val broadcastCls = classOf[Broadcast[_]].getName
    val cmsCls = classOf[org.apache.spark.util.sketch.CountMinSketch].getName
    val ref = ctx.addReferenceObj("cmsBroadcast", cms, broadcastCls)
    val sketch = ctx.addMutableState(cmsCls, "cmsSketch",
      v => s"$v = ($cmsCls) $ref.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $sketch.estimateCount($c.toString()) >= ${threshold}L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsAtLeast {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(cms: Broadcast[org.apache.spark.util.sketch.CountMinSketch],
            threshold: Long)(t: Column): Column =
    ColumnBridge.column(
      new CmsAtLeast(ColumnBridge.expression(t), cms, threshold))
}
