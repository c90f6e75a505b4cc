package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (SURVEY.md §2.G):
  * fold (acc * 31 + codepoint) mod 1e9+7 over the text's code points in
  * ONE pass over the UTF-8 bytes.
  *
  * Replaces the column-algebra fold `aggregate(transform(split(text,
  * ''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31 + x) % 1000000007)`,
  * which materialized two per-row arrays and ran the fold interpreted
  * per CHARACTER (HOFs sit outside whole-stage codegen). Bit-identical
  * by construction, differential-tested in TextOpsSpec: Spark's
  * `split(text, '')` is Java `String.split("")` — one element per code
  * point (surrogate pairs stay together) and a single "" element for
  * empty text — and `ascii(c)` is `substring(0,1).codePointAt(0)` (the
  * full code point, 0 for ""), so the fold is exactly a code-point fold
  * with empty text hashing to 0 ((0*31+0) mod M). The kernel decodes
  * code points straight off the UTF8String bytes (UTF8String is valid
  * UTF-8 by contract), never allocating.
  *
  * acc stays < 1e9+7 and code points < 2^21, so acc*31 + cp < 2^35 —
  * no overflow headroom needed beyond a long.
  */
case class RollingHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }

  /** Public so generated code can call it through a reference object. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      }
      acc = (acc * 31L + cp) % 1000000007L
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("hasher", this, classOf[RollingHashFp].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
