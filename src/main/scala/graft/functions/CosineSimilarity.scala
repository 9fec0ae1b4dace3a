package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity between two ARRAY<FLOAT> columns.
  *
  * The similarity/dedup queries (ann_bruteforce_topk, ann_ivf_topk,
  * dedup_embedding_cosine) sit this formula on every candidate pair;
  * the composed `aggregate(zip_with(...))` higher-order-function chain
  * it replaces is interpreted (lambda frame + boxed Double per
  * element), while this is one fused primitive loop inside whole-stage
  * codegen.
  *
  * Semantics are EXACTLY the SQL chain's, bit-for-bit (the DuckDB
  * oracle hash-compares 6-decimal-rounded scores): a sequential
  * index-order fold of double products for the dot and both norms,
  * then one division. Null array, length mismatch (zip_with pads with
  * null), any null element, or a zero denominator (Spark's non-ANSI
  * Divide) each yield null.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Both sides must arrive as exactly ARRAY<FLOAT>: eval/codegen read
    * elements with `ArrayData.getFloat`, which silently returns garbage
    * on any other element width. Hard type check (rather than
    * `ImplicitCastInputTypes`, whose `AbstractDataType` is private[sql]
    * in Spark 4) so ARRAY<DOUBLE> is rejected in BOTH ANSI and legacy
    * coercion modes — legacy `implicitCast` would otherwise silently
    * narrow double→float and diverge from the zip_with SQL chain this
    * expression matches bit-for-bit.
    *
    * Deliberate behavior change vs the ImplicitCastInputTypes version:
    * integer arrays are no longer implicitly widened either — callers
    * must `CAST(arr AS ARRAY<FLOAT>)` explicitly. Uniform rejection is
    * chosen over re-implementing the analyzer's widening here: an
    * explicit cast documents the precision change at the call site.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = aa.getFloat(i).toDouble
      val y = bb.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val aArr = ctx.freshName("aArr")
    val bArr = ctx.freshName("bArr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    val hasNull = ctx.freshName("hasNull")
    val code =
      code"""
        ${a.code}
        ${b.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${a.isNull} && !${b.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $aArr = ${a.value};
          org.apache.spark.sql.catalyst.util.ArrayData $bArr = ${b.value};
          int $n = $aArr.numElements();
          if ($bArr.numElements() == $n) {
            double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
            boolean $hasNull = false;
            for (int $i = 0; $i < $n && !$hasNull; $i++) {
              if ($aArr.isNullAt($i) || $bArr.isNullAt($i)) { $hasNull = true; }
              else {
                double $x = (double) $aArr.getFloat($i);
                double $y = (double) $bArr.getFloat($i);
                $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
              }
            }
            if (!$hasNull) {
              double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
              if ($denom != 0.0) { ${ev.isNull} = false; ${ev.value} = $dot / $denom; }
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
