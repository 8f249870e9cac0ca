package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd L1 distance between two packed 8-bit-lane count
  * sketches (`array<bigint>`, 8 unsigned byte lanes per element) —
  * the candidate-pruning kernel of the exact set-similarity join.
  *
  * Each long packs 8 bucket counts (low lane first); the result is
  * Σ|a_lane − b_lane| over every lane of every element. Because each
  * bucket count under-merges distinct tokens, the lane-wise L1 is a
  * LOWER bound on the symmetric difference |A Δ B| of the underlying
  * sets, so `graft_packed_l1(a, b) > |A|+|B|−2α` exactly refutes
  * "overlap ≥ α" — a deterministic, exactness-preserving filter.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §4.3 preference
  * order b): the composable form is a 64-term unrolled sum (blows
  * past the JIT method-size limit and falls back to interpreted
  * evaluation — measured 4× slower end-to-end on the candidate join)
  * or a higher-order `aggregate` lambda (interpreted per element).
  * This loop stays inside whole-stage codegen and allocates nothing.
  *
  * Semantics: NULL if either array is NULL or lengths differ; element
  * NULLs treated as 0 (the packed builder never emits them).
  */
case class PackedCountL1Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_packed_l1"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0L else x.getLong(i)
      val yi = if (y.isNullAt(i)) 0L else y.getLong(i)
      var k = 0
      while (k < 8) {
        val la = (xi >>> (k * 8)) & 255L
        val lb = (yi >>> (k * 8)) & 255L
        acc += math.abs(la - lb)
        k += 1
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      s"""
      final int $n = $x.numElements();
      if ($n != $y.numElements()) {
        ${ev.isNull} = true;
      } else {
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          final long $xi = $x.isNullAt($i) ? 0L : $x.getLong($i);
          final long $yi = $y.isNullAt($i) ? 0L : $y.getLong($i);
          for (int $k = 0; $k < 64; $k += 8) {
            final long $la = ($xi >>> $k) & 255L;
            final long $lb = ($yi >>> $k) & 255L;
            $acc += java.lang.Math.abs($la - $lb);
          }
        }
        ${ev.value} = $acc;
      }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedCountL1Expr =
    copy(left = newLeft, right = newRight)
}
