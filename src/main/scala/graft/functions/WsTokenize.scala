package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-scan kernel for the whitespace tokenizer family.
  *
  * Replicates `split(trim(text), "\\s+")` exactly — including the
  * regex's edge semantics, pinned differentially in TextOpsSpec:
  * leading/trailing NON-space whitespace (trim strips only 0x20)
  * yields empty leading/trailing elements (Java `Pattern.split` with
  * limit -1), and the empty string tokenizes to `[""]`. `\s` in Java's
  * default mode is the six ASCII bytes 0x09–0x0D + 0x20, all of which
  * are single-byte in UTF-8 and can never appear inside a multi-byte
  * sequence, so byte-level splitting is UTF-8-correct.
  */
object WsTokenize {
  @inline def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** split(trim(s), "\\s+") without the regex engine: one byte scan. */
  def tokenize(s: UTF8String): ArrayData = {
    val t = s.trim() // exact StringTrim semantics (strips 0x20 only)
    val n = t.numBytes()
    if (n == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val bytes = t.getBytes
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** size(split(trim(s), "\\s+")) without materializing the array:
    * the element count is (number of whitespace runs) + 1 — leading /
    * trailing runs contribute their empty elements by the same rule. */
  def count(s: UTF8String): Long = {
    val t = s.trim()
    val n = t.numBytes()
    if (n == 0) return 1L
    var runs = 0L
    var i = 0
    while (i < n) {
      if (isWs(t.getByte(i))) {
        runs += 1
        i += 1
        while (i < n && isWs(t.getByte(i))) i += 1
      } else i += 1
    }
    runs + 1L
  }
}

/** Native whitespace tokenizer: value-identical to
  * `split(trim(text), "\\s+")` but a single codegen'd byte scan — no
  * regex engine, no java.lang.String round-trip, one allocation per
  * token. The workhorse under every text entry's tokenization
  * projection; TextOpsSpec pins the differential identity against the
  * regex form on adversarial inputs (tabs, newlines, unicode,
  * empties). */
case class WsTokenizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokenize"

  override protected def nullSafeEval(input: Any): Any =
    WsTokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WsTokenize.tokenize($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native whitespace-token count: value-identical to
  * `size(split(trim(text), "\\s+"))` (cast to long) but counts
  * whitespace runs in one byte scan with ZERO allocation — the right
  * kernel for the many entries that only need `n_tokens`, where
  * materializing the token array just to take its size is pure GC
  * pressure. */
case class WsTokenCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "ws_token_count"

  override protected def nullSafeEval(input: Any): Any =
    WsTokenize.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WsTokenize.count($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
