package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 64-bit token hashes for a whole array<string> in one
  * call: each element hashes to the first 8 md5 digest bytes, big-endian —
  * the value a DuckDB oracle recomputes as
  * `('0x' || substr(md5(t),1,16))::UBIGINT`, bit for bit.
  *
  * One expression eval per ROW (a tight JVM loop over the token array)
  * replaces the per-token interpreted pipeline
  * `transform(tokens, t -> conv(substr(md5(t),1,8),16,10) << 32 | ...)`:
  * higher-order functions never enter whole-stage codegen, so every token
  * paid lambda dispatch plus hex-string slicing and two string-radix
  * conversions. Here the digest goes straight from bytes to a long. */
case class Md5Hash64Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_hash64_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0L else Md5Hash64Array.hash64(arr.getUTF8String(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.isNullAt($i) ? 0L
         |    : graft.functions.Md5Hash64Array.hash64($a.getUTF8String($i));
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64Array {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 digest bytes of the UTF-8 string, packed big-endian. */
  def hash64(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
  }
}
