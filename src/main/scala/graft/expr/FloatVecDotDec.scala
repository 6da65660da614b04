package graft.expr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native DECIMAL-exact dot product of two `array<float>` columns, as
  * double — the compiled form of the engine's order-independent dot
  * ([[graft.ops.Similarity.dotExact]]'s reference semantics):
  *
  * {{{
  * aggregate(
  *   zip_with(a, b, (x, y) => ((double) x * (double) y).cast(decimal(30,16))),
  *   0 as decimal(30,16),
  *   (acc, x) => (acc + x).cast(decimal(30,16))
  * ).cast(double)
  * }}}
  *
  * Why a custom expression: that HOF chain is interpreted per element
  * (lambda dispatch, an intermediate decimal array per row, a Catalyst
  * `Cast` eval per product) and measured ~0.5 ms per 64-dim evaluation —
  * the hot path of every exact cosine (brute-force kNN, Voronoi
  * assignment, near-dup re-rank). This loop is plain JVM code on
  * `java.math.BigDecimal`, ~20× faster, and emitted into whole-stage
  * codegen.
  *
  * Bit-parity contract with the HOF form (spec-asserted at the
  * `doubleToLongBits` level):
  *  - per-element product in IEEE double;
  *  - product → decimal(30,16) exactly as Spark's `Cast`: the SHORTEST
  *    decimal representation of the double (`BigDecimal.valueOf` ==
  *    `Decimal.set(Double)`'s text path), then HALF_UP at scale 16;
  *  - accumulation is exact decimal addition (the HOF's (31,16)→(30,16)
  *    re-cast never rounds — same scale — so plain `add` matches);
  *  - final decimal → double via `BigDecimal.doubleValue`, ==
  *    `Decimal.toDouble`;
  *  - NULL iff the lengths differ or an element is null (`zip_with` pads
  *    the shorter array with nulls, which poison the HOF's fold), or an
  *    input array is null.
  *
  * Assumes finite float inputs (embedding columns); precision-30 overflow
  * (|Σ| ≥ 10^14) is out of contract for unit-scale vectors, matching the
  * `Dec` accumulator note in [[graft.ops.Similarity]].
  */
case class FloatVecDotDec(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot_dec"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    FloatVecDotDec.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Double $boxed = graft.expr.FloatVecDotDec.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDotDec =
    copy(left = newLeft, right = newRight)
}

object FloatVecDotDec {
  /** The shared loop for eval and codegen: boxed Double, null on the
    * poison cases. One method so interpreted and generated paths cannot
    * drift. */
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = ZERO_S16
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      // valueOf = shortest-decimal-text parse, Spark's Cast(double→decimal)
      acc = acc.add(JBigDecimal.valueOf(d).setScale(16, RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  private val ZERO_S16 = JBigDecimal.ZERO.setScale(16)
}
