package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product between two ARRAY<BIGINT>
  * columns — the per-pair kernel of int8-quantized similarity search
  * (ann_int8_topk): after symmetric scalar quantization the score is
  * int_dot(qa, qb) / (sqrt(qn_a) * sqrt(qn_b)) with the norms
  * precomputed per vector, so the only per-pair work is this fold.
  * Replaces the interpreted `aggregate(zip_with(...))` chain (lambda
  * frame + boxed Long per element) with one fused primitive loop
  * inside whole-stage codegen.
  *
  * Semantics match the HOF chain's for null handling: null array,
  * length mismatch (zip_with pads with null), or any null element
  * yields null; otherwise a sequential index-order sum of products.
  * One divergence outside the int8 envelope: on Long overflow this
  * expression always wraps (like non-ANSI arithmetic), whereas the
  * HOF chain under ANSI mode throws. Unreachable for int8-quantized
  * inputs — |x*y| ≤ 127², so 2⁶³ needs ~7·10¹⁴ dims — but general
  * ARRAY<BIGINT> callers should not rely on ANSI overflow errors.
  */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      dot += aa.getLong(i) * bb.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val aArr = ctx.freshName("aArr")
    val bArr = ctx.freshName("bArr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val hasNull = ctx.freshName("hasNull")
    val code =
      code"""
        ${a.code}
        ${b.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${a.isNull} && !${b.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $aArr = ${a.value};
          org.apache.spark.sql.catalyst.util.ArrayData $bArr = ${b.value};
          int $n = $aArr.numElements();
          if ($bArr.numElements() == $n) {
            long $dot = 0L;
            boolean $hasNull = false;
            for (int $i = 0; $i < $n && !$hasNull; $i++) {
              if ($aArr.isNullAt($i) || $bArr.isNullAt($i)) { $hasNull = true; }
              else { $dot += $aArr.getLong($i) * $bArr.getLong($i); }
            }
            if (!$hasNull) { ${ev.isNull} = false; ${ev.value} = $dot; }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
