package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash over an array<bigint> of token hashes.
  *
  * Semantics identical to [[graft.dedup.DedupOps.simhashAlgebra]]: bit i is
  * set iff more than half the token hashes have bit i set (the +1/-1 vote).
  * The column-algebra form needs 64 interpreted `aggregate` folds (lambda
  * dispatch per token per bit); this expression is one fused loop with a
  * local 64-counter table, inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Long](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) { cnt(i) += (h >>> i) & 1L; i += 1 }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (cnt(i) * 2 > n) out |= 1L << i; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) { $cnt[$i] += ($h >>> $i) & 1L; }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) { if ($cnt[$i] * 2 > $n) $out |= 1L << $i; }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
