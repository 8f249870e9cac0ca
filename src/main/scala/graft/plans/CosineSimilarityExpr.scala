package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric arrays
  * (float or double elements), the hot kernel of ANN search.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §4.3 preference
  * order b): the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_) / (norm(a) * norm(b))`
  * allocates an intermediate array per scored pair and walks both
  * arrays five times; this expression fuses dot product and both norms
  * into one allocation-free loop, in both interpreted (`nullSafeEval`)
  * and generated (`doGenCode`) form — keeping the ANN scoring loop
  * inside whole-stage codegen.
  *
  * Semantics (bit-compatible with the composable form):
  *   - double-precision sequential accumulation in element order;
  *   - NULL if either array is NULL, lengths differ, or any element is
  *     NULL (zip_with's null padding ⇒ null sum, reproduced here);
  *   - IEEE division (zero-norm inputs yield NaN/Infinity, not NULL).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var dot = 0d; var nx = 0d; var ny = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
      final int $n = $x.numElements();
      if ($n != $y.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
          final double $xi = (double) $x.$xGet($i);
          final double $yi = (double) $y.$yGet($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        if (!${ev.isNull}) {
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}
