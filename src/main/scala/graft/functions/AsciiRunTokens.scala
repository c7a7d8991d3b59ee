package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer expression: maximal `[a-z0-9]+` runs of a string, equivalent to
  * `regexp_extract_all(s, '[a-z0-9]+', 0)` but a single byte scan instead of
  * the regex engine (measured ~1.9s per evaluation over the sf0.1 documents
  * for the regex; the scan is a few ms). Callers pass the ALREADY-LOWERED
  * string (TextOps.fastTokens wraps `lower()` around it), which preserves
  * exact regex semantics for all input: after unicode lowercasing, the token
  * chars are the single bytes 0x61-0x7a / 0x30-0x39, and every byte of a
  * multi-byte UTF-8 char is >= 0x80 — never a token byte — so byte runs and
  * regex matches coincide (locked by a differential test in TextOpsSpec).
  *
  * The scan lives in [[AsciiRunTokens.tokenize]]; generated code emits one
  * call to its static forwarder, keeping whole-stage codegen intact with a
  * tiny method body. */
case class AsciiRunTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    AsciiRunTokens.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiRunTokens.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiRunTokens {

  private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Static entry for both interpreted eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < bytes.length) {
      if (isTok(bytes(i))) {
        var j = i + 1
        while (j < bytes.length && isTok(bytes(j))) j += 1
        out += UTF8String.fromBytes(bytes, i, j - i)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
