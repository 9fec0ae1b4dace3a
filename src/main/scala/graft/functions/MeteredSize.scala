package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd metered-size expression:
  * `8 + 2*#headers + Σ(len(name)+len(value)) + len(body)`
  * (common/src/record/envelope.rs:74-78; SURVEY §4 "custom Catalyst
  * work actually warranted" item 1).
  *
  * The formula sits on every ingest row and every metrics aggregate, so
  * it gets a single fused loop in generated code instead of the
  * composed `aggregate(transform(...))` higher-order-function chain
  * (which allocates a lambda frame per header). Null headers/body are
  * treated as empty; the result is never null.
  */
case class MeteredSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "metered_size"

  override def eval(input: InternalRow): Any = {
    var sz = 8L
    val headers = left.eval(input)
    if (headers != null) {
      val arr = headers.asInstanceOf[ArrayData]
      val n = arr.numElements()
      sz += 2L * n
      var i = 0
      while (i < n) {
        val s = arr.getStruct(i, 2)
        if (s != null) {
          if (!s.isNullAt(0)) sz += s.getBinary(0).length
          if (!s.isNullAt(1)) sz += s.getBinary(1).length
        }
        i += 1
      }
    }
    val body = right.eval(input)
    if (body != null) sz += body.asInstanceOf[Array[Byte]].length
    sz
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = left.genCode(ctx)
    val b = right.genCode(ctx)
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val code =
      code"""
        ${h.code}
        ${b.code}
        long ${ev.value} = 8L;
        if (!${h.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${h.value};
          int $n = $arr.numElements();
          ${ev.value} += 2L * $n;
          for (int $i = 0; $i < $n; $i++) {
            org.apache.spark.sql.catalyst.InternalRow $s = $arr.getStruct($i, 2);
            if ($s != null) {
              if (!$s.isNullAt(0)) { ${ev.value} += $s.getBinary(0).length; }
              if (!$s.isNullAt(1)) { ${ev.value} += $s.getBinary(1).length; }
            }
          }
        }
        if (!${b.isNull}) { ${ev.value} += ${b.value}.length; }
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: metered_size(headers, body). (Spark 4: Column wraps a
    * ColumnNode; the bridge is the catalyst conversion.)
    */
  def metered_size(headers: Column, body: Column): Column =
    Bridge.column(MeteredSizeExpr(
      Bridge.expression(headers), Bridge.expression(body)))

  /** Column API: cosine_sim(a, b) over two ARRAY<FLOAT> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** Column API: int_dot(a, b) over two ARRAY<BIGINT> columns. */
  def int_dot(a: Column, b: Column): Column =
    Bridge.column(IntDotExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** Column API: binary_sig(v, word) — 16-bit signature word of the
    * 128-plane binary quantization (word in 0..7). */
  def binary_sig(v: Column, word: Int): Column =
    Bridge.column(BinarySigExpr(Bridge.expression(v), word))

  /** Column API: record_decrypt(body, key, aad) — per-record
    * format-byte-dispatched AEAD decryption (A13 read path).
    */
  def record_decrypt(body: Column, key: Array[Byte], aad: Array[Byte]): Column =
    record_decrypt(body, key, org.apache.spark.sql.functions.lit(aad))

  /** Column API with a per-row AAD column (basin-wide decrypting scan:
    * the AAD derives from the `stream` column, so one project decrypts
    * every stream — never one plan branch per stream).
    */
  def record_decrypt(body: Column, key: Array[Byte], aad: Column): Column =
    Bridge.column(RecordDecryptExpr(
      Bridge.expression(body), Bridge.expression(aad), key))

  /** SQL registration: SELECT metered_size(headers, body),
    * cosine_sim(va, vb), int_dot(qa, qb) ...
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "metered_size",
      exprs => MeteredSizeExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "int_dot",
      exprs => IntDotExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "binary_sig",
      exprs => {
        // SQL form: binary_sig(v, <word literal 0..7>) — the word
        // selects which 16 planes the expression bakes in, so it must
        // be foldable at registration time
        val word = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
              if v >= 0 && v <= 7 => v
          case other => throw new IllegalArgumentException(
            s"binary_sig word must be an INT literal in 0..7, got $other")
        }
        BinarySigExpr(exprs(0), word)
      })
  }
}
