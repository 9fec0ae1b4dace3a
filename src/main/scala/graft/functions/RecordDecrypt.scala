package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native codegen'd record decryption for scans (A13).
  *
  * Dispatches per record on the reference's leading format byte
  * (storage/src/record/encryption.rs:1-29: 0x01 AEGIS-256 v1,
  * 0x02 AES-256-GCM v1), authenticates with the caller-supplied AAD,
  * and decodes the decrypted payload as the byte-for-byte plaintext
  * EnvelopeRecord encoding (headers INCLUDED — the reference encrypts
  * the whole envelope, encryption.rs:243-272, not just the body), so
  * the result is a struct<headers, body> the read plan projects back
  * into the logical record columns. The key and AAD ride along as
  * reference objects so the call sits inside whole-stage codegen —
  * read-side decryption is a plan column, never a driver loop (the
  * reference decrypts in its session loop, read.rs:74-91).
  *
  * Tag mismatch / unknown format throw (AEADBadTagException) and fail
  * the task — auth failure is never silent garbage. Null input → null.
  */
case class RecordDecryptExpr(child: Expression, key: Array[Byte], aad: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = graft.log.EnvelopeCodec.structType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "record_decrypt"

  /** Deliberately non-deterministic-flagged (the function IS pure):
    * Catalyst inlines deterministic aliases into pushed-down predicates
    * and collapsed projects, so a query touching both restored columns
    * re-ran the cipher up to 4x per record (measured by
    * EnvelopeCodec.decryptCalls; pinned in RecordDecryptPlanSpec). The
    * flag pins the decrypt into ONE project node — predicates on
    * pass-through columns (seq_num, timestamp) still push to the scan
    * below it, which is where the read path applies them anyway.
    */
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.log.EnvelopeCodec.decryptToRow(key, aad, v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("recKey", key, "byte[]")
    val aadRef = ctx.addReferenceObj("recAad", aad, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.log.EnvelopeCodec.decryptToRow($keyRef, $aadRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
