package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions for the text-dedup hot path.
  *
  * Why custom (measured, not guessed — BENCH r3 at sf0.1): the built-in
  * formulations put a per-element lambda inside a per-bit/per-seed outer
  * lambda, and Catalyst neither CSEs the inner hash array across lambda
  * bodies nor runs higher-order functions in whole-stage codegen — simhash
  * via `transform(sequence(0,59), i -> aggregate(hashes, ...))` re-walked
  * every token 60×, q_simhash cost 107 s of a 202 s bench; the
  * seeded-md5 minhash family cost k md5 calls per shingle
  * (q_fingerprint 37 s, q_neardup_minhash 31 s). Both expressions here do
  * ONE pass over a pre-hashed `array<long>` in a tight generated loop.
  *
  * Both consume 60-bit base hashes (`graft.functions.Hashes.h60` — md5,
  * engine-portable) so every derived value remains reproducible in the
  * DuckDB oracle.
  */
object Sketches {
  val Mask60: Long = (1L << 60) - 1

  /** Deterministic affine minhash family over Z_2^60:
    * h_i(x) = (A(i)·x + B(i)) mod 2^60. Odd multiplier ⇒ bijection on
    * Z_2^64 truncated to the low 60 bits; low bits of a wrapped 64-bit
    * product equal the infinite-precision product's low bits, so DuckDB
    * reproduces it exactly with HUGEINT arithmetic:
    * `((A::HUGEINT * x + B) % 2^60)::BIGINT`.
    * Constants are splitmix/golden-ratio multiples — fixed, public math.
    */
  def affineA(i: Int): Long = (0x9E3779B97F4A7C15L * (2L * i + 1)) & Mask60
  def affineB(i: Int): Long = (0xC2B2AE3D27D4EB4FL * (i + 1L)) & Mask60

  /** DuckDB rendering of h_i over a BIGINT expression (oracle parity). */
  def affineSql(inner: String, i: Int): String =
    s"CAST(((CAST(${affineA(i)} AS HUGEINT) * ($inner) + ${affineB(i)}) " +
      s"% ${Mask60 + 1}) AS BIGINT)"
}

/** 60-bit SimHash of an `array<long>` of (64/60-bit) element hashes:
  * per bit position j, sum ±1 votes from each element's bit j (term
  * frequency weighted — duplicates count), emit bit j iff the sum is
  * positive. One pass; 60 counters in reused mutable state.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](60)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (cnt(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cnt = ctx.addMutableState("int[]", "simhashCnt", v => s"$v = new int[60];")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |java.util.Arrays.fill($cnt, 0);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($cnt[$j] > 0) ${ev.value} |= 1L << $j;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Position-weighted n-gram hashes of an `array<long>` of token hashes:
  * out[i] = (Σ_j A(j)·h[i+j] + B(0)) mod 2^60 for each window start i —
  * the n-gram identity WITHOUT constructing n-gram strings (the string
  * shingle pipeline — `concat_ws` per window — was the dominant cost of the
  * near-dup bench query). Result keeps duplicates; compose with
  * `array_distinct` for set semantics. Empty output when fewer than n
  * tokens. DuckDB reproduces it with the same HUGEINT identity as
  * [[Sketches.affineSql]].
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16, s"ngram_hashes n out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  private lazy val as: Array[Long] = Array.tabulate(n)(Sketches.affineA)
  private lazy val b0: Long = Sketches.affineB(0)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = b0
      var j = 0
      while (j < n) { acc += as(j) * arr.getLong(i + j); j += 1 }
      out(i) = acc & Sketches.Mask60
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("ngramA", as, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $m = $a.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $acc = ${b0}L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $asRef[$j] * $a.getLong($i + $j);
         |  }
         |  $out[$i] = $acc & ${Sketches.Mask60}L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** ASC-sorted distinct sliding-window minima of an `array<long>` — the
  * winnowing fingerprint selection of Schleimer/Wilkerson/Aiken (SIGMOD
  * 2003) over a positional hash stream, as ONE generated loop (the
  * composed `transform(sequence…, i → array_min(slice…))` form pays the
  * no-codegen-inside-HOF tax this expression family exists to remove).
  * Output order is defined as ascending because a fingerprint SET has no
  * inherent order and sortedness makes the result canonical across
  * engines. Empty output when fewer than `w` elements. DuckDB mirror:
  * `list_sort(list_distinct(list_transform(generate_series(1,
  * greatest(len(h)-w+1, 0)), i -> list_min(h[i:i+w-1]))))`.
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1 && w <= 64, s"winnow_mins w out of range: $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - w + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](m)
    var i = 0
    while (i < m) {
      var mn = arr.getLong(i)
      var j = 1
      while (j < w) {
        val v = arr.getLong(i + j)
        if (v < mn) mn = v
        j += 1
      }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var k = 0
    var p = 0
    while (p < m) { if (p == 0 || mins(p) != mins(p - 1)) k += 1; p += 1 }
    val out = new Array[Long](k)
    var q = 0
    p = 0
    while (p < m) {
      if (p == 0 || mins(p) != mins(p - 1)) { out(q) = mins(p); q += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val mn = ctx.freshName("mn")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
         |int $m = $a.numElements() - $w + 1;
         |if ($m < 0) $m = 0;
         |long[] $mins = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $mn = $a.getLong($i);
         |  for (int $j = 1; $j < $w; $j++) {
         |    long $v = $a.getLong($i + $j);
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $mins[$i] = $mn;
         |}
         |java.util.Arrays.sort($mins);
         |int $k = 0;
         |for (int $p = 0; $p < $m; $p++) {
         |  if ($p == 0 || $mins[$p] != $mins[$p - 1]) $k++;
         |}
         |long[] $out = new long[$k];
         |int $q = 0;
         |for (int $p = 0; $p < $m; $p++) {
         |  if ($p == 0 || $mins[$p] != $mins[$p - 1]) $out[$q++] = $mins[$p];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** MinHash signature of an `array<long>` of element hashes under the
  * affine family [[Sketches.affineA]]/[[Sketches.affineB]]: k minima in one
  * pass (n·k fused multiply-add-mask ops, no intermediate arrays). NULL for
  * an empty input array (mirrors `array_min` of an empty projection).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 512, s"minhash_sig k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = Array.tabulate(k)(Sketches.affineA)
  private lazy val bs: Array[Long] = Array.tabulate(k)(Sketches.affineB)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) & Sketches.Mask60
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val mins = ctx.addMutableState("long[]", "minhashMins", v => s"$v = new long[$k];")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($asRef[$j] * $h + $bsRef[$j]) & ${Sketches.Mask60}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($mins, $k));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
