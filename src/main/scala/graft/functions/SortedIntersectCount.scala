package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| of two SORTED-DISTINCT long arrays by linear merge
  * (SURVEY.md §2.G) — the pair-verification hot kernel of the shingle
  * miners (Jaccard, containment, MinHash-LSH verify), whose inputs are
  * [[ShingleHash64]] outputs and therefore sorted distinct by
  * construction.
  *
  * Drop-in for `size(array_intersect(a, b))` on such inputs
  * (differential-tested in DedupSpec): ArrayIntersect builds a boxed
  * hash set and materializes the intersection array per PAIR — the
  * candidate stream is the only O(pairs x shingles) volume in the
  * verify stage — where the merge walks both arrays once,
  * allocation-free. Inputs that are not strictly ascending raise
  * loudly: a silent wrong count would admit or drop near-duplicate
  * pairs, and the check rides the comparisons the merge already does.
  * Null elements are rejected by the same strictness (ShingleHash64
  * arrays never contain them).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ($l, $r)")
    }

  /** Public so generated code can call it through a reference object. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    var prevA = Long.MinValue
    var prevB = Long.MinValue
    var firstA = true
    var firstB = true
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (!firstA && x <= prevA)
        throw new IllegalArgumentException(
          s"$prettyName: left array not strictly ascending at index $i")
      if (!firstB && y <= prevB)
        throw new IllegalArgumentException(
          s"$prettyName: right array not strictly ascending at index $j")
      if (x == y) {
        n += 1; prevA = x; prevB = y; firstA = false; firstB = false
        i += 1; j += 1
      } else if (x < y) {
        prevA = x; firstA = false; i += 1
      } else {
        prevB = y; firstB = false; j += 1
      }
    }
    n
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("merger", this, classOf[SortedIntersectCount].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
