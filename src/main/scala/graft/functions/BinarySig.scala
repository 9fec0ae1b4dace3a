package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** One 16-bit word of the 128-plane binary-quantization signature
  * (ann_binary_topk): planes 16*word .. 16*word+15, sign of the
  * ±1-hyperplane dot per plane.
  *
  * Replaces 16 interpreted `aggregate(zip_with(...))` folds per word
  * (128 per vector) with ONE fused primitive loop inside whole-stage
  * codegen: each plane's 64 ±1 components pack into a single 64-bit
  * mask embedded as a literal in the generated code, so the inner
  * loop is 16 sign-selected adds per element — no lambda frames, no
  * boxing, no array-of-planes memory traffic.
  *
  * Bit-for-bit identical to the SQL chain it replaces (the DuckDB
  * oracle recomputes the folds): x * 1.0 == x and x * -1.0 == -x
  * exactly in IEEE, and the accumulation order is the same
  * sequential index fold, so every dot — and therefore every sign —
  * matches. Null ARRAY yields null; a null ELEMENT or a wrong-length
  * vector yields word 0 (not null), because in the SQL chain the
  * null poisons every plane's dot and `CASE WHEN null >= 0` takes
  * the ELSE branch for every bit.
  */
object BinarySigExpr {
  /** Plane component sign for salt "bsig-p:j" — the SAME derivation
    * VectorOps inlines as ±1.0 literals in the DuckDB oracle. */
  def planePositive(p: Int, j: Int): Boolean = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"bsig-$p:$j".getBytes("UTF-8"))
    (h(0) & 0x80) == 0
  }

  /** 64 signs of plane p as a bitmask: bit j set = component +1. */
  def planeMask(p: Int): Long =
    (0 until 64).foldLeft(0L)((m, j) =>
      if (planePositive(p, j)) m | (1L << j) else m)

  /** All 128 plane masks, computed once: Catalyst copies expressions
    * on nearly every tree transform, and each copy would otherwise
    * re-run 1024 MD5 digests on the driver. */
  private[functions] lazy val AllMasks: Array[Long] =
    (0 until 128).map(planeMask).toArray
}

case class BinarySigExpr(child: Expression, word: Int)
    extends UnaryExpression {

  private def masks: Array[Long] = BinarySigExpr.AllMasks
  private def maskAt(b: Int): Long = masks(16 * word + b)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "binary_sig"

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // SQL parity for a wrong-length vector: zip_with null-pads, the
    // dot folds to NULL, and `CASE WHEN null >= 0` takes the ELSE
    // branch — every bit 0, word 0, NOT null
    if (n != 64) return 0
    val dots = new Array[Double](16)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0
      val x = arr.getFloat(j).toDouble
      var b = 0
      while (b < 16) {
        if (((maskAt(b) >>> j) & 1L) == 1L) dots(b) += x
        else dots(b) -= x
        b += 1
      }
      j += 1
    }
    var sig = 0
    var b = 0
    while (b < 16) {
      // !(x < 0), not (x >= 0): a NaN dot (NaN/Inf input values) must
      // SET the bit — Spark SQL's `>= 0` is nan-safe (NaN sorts above
      // everything) and DuckDB evaluates NaN >= 0 as true, while
      // Java's NaN >= 0.0 is false
      if (!(dots(b) < 0.0)) sig |= (1 << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val b = ctx.freshName("b")
    val x = ctx.freshName("x")
    val sig = ctx.freshName("sig")
    val hasNull = ctx.freshName("hasNull")
    // per-row dot accumulators hoisted to mutable state: no allocation
    // in the row loop
    val dots = ctx.addMutableState("double[]", "binSigDots",
      v => s"$v = new double[16];")
    val masksArr = ctx.addMutableState("long[]", "binSigMasks",
      v => s"$v = new long[] {${(0 until 16).map(b => maskAt(b) + "L").mkString(", ")}};")
    val code =
      code"""
        ${a.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${a.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${a.value};
          int $n = $arr.numElements();
          ${ev.isNull} = false;
          if ($n == 64) {
            boolean $hasNull = false;
            for (int $b = 0; $b < 16; $b++) { $dots[$b] = 0.0; }
            for (int $j = 0; $j < $n && !$hasNull; $j++) {
              if ($arr.isNullAt($j)) { $hasNull = true; }
              else {
                double $x = (double) $arr.getFloat($j);
                for (int $b = 0; $b < 16; $b++) {
                  if ((($masksArr[$b] >>> $j) & 1L) == 1L) {
                    $dots[$b] += $x;
                  } else {
                    $dots[$b] -= $x;
                  }
                }
              }
            }
            if (!$hasNull) {
              int $sig = 0;
              for (int $b = 0; $b < 16; $b++) {
                // NaN-parity with Spark SQL / DuckDB `>= 0`: NaN sets the bit
                if (!($dots[$b] < 0.0)) { $sig |= (1 << $b); }
              }
              ${ev.value} = $sig;
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
