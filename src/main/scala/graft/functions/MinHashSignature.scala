package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-permutation MinHash signature over an array<bigint> of element
  * hashes.
  *
  * Permutation i applies Murmur3's public-domain fmix64 finalizer to
  * `h ^ seed(i)` (seed = i * golden-gamma) — a 2-multiply mix, not a full
  * re-hash, and the whole signature is one fused loop per row instead of k
  * interpreted `transform`+`array_min` passes. Collision behavior matches
  * any strong 64-bit family, so banded-LSH recall guarantees carry over.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, s"bad signature width $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        var m = h ^ (0x9E3779B97F4A7C15L * (i + 1))
        m ^= m >>> 33; m *= 0xFF51AFD7ED558CCDL
        m ^= m >>> 33; m *= 0xC4CEB9FE1A85EC53L
        m ^= m >>> 33
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $m = $h ^ (0x9E3779B97F4A7C15L * ($i + 1));
         |    $m ^= $m >>> 33; $m *= 0xFF51AFD7ED558CCDL;
         |    $m ^= $m >>> 33; $m *= 0xC4CEB9FE1A85EC53L;
         |    $m ^= $m >>> 33;
         |    if ($m < $sig[$i]) $sig[$i] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
