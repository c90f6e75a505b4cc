package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ asymmetric-distance lookup (SURVEY.md §2.G): given a
  * candidate's PQ codes (array<int>, one sub-quantizer code per block)
  * and a query's packed distance table (array<double>, slot
  * `b * cells + c` = distance of the query's block b to codebook cell
  * c), returns Σ_b dt[b * cells + codes[b]] — the ADC score.
  *
  * This is the per-candidate hot kernel of the IVFPQ serving path
  * (SimilarityOps.annTopkIvfPqRanked): the candidate stream is the only
  * O(queries x probed-corpus) volume in the plan, and the previous
  * `aggregate()` higher-order-function form ran INTERPRETED per row
  * (HOFs sit outside whole-stage codegen, paying lambda-variable
  * binding per block per candidate). This expression is one fused loop
  * in generated code, like its siblings [[ArrayDotProduct]] /
  * [[SimHash64]].
  *
  * Semantics: blocks = codes.numElements() (the code array drives the
  * loop); a code outside [0, cells) or a table shorter than
  * blocks*cells raises — silently skipping a block would return a
  * plausible-but-wrong distance (differential-tested against the HOF
  * algebra form in SimilaritySpec).
  */
case class AdcLookup(left: Expression, right: Expression, cells: Int)
    extends BinaryExpression {

  require(cells > 0, s"adc_lookup: cells must be positive, got $cells")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> dt) inputs, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dt = b.asInstanceOf[ArrayData]
    val blocks = codes.numElements()
    val nDt = dt.numElements()
    var sum = 0.0
    var i = 0
    while (i < blocks) {
      val c = codes.getInt(i)
      val slot = i * cells + c
      if (c < 0 || c >= cells || slot >= nDt)
        throw new IllegalArgumentException(
          s"adc_lookup: code $c at block $i out of range (cells=$cells, dt length $nDt)")
      sum += dt.getDouble(slot)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val blocks = ctx.freshName("blocks")
      val nDt = ctx.freshName("nDt"); val c = ctx.freshName("c")
      val slot = ctx.freshName("slot"); val sum = ctx.freshName("sum")
      s"""
         |int $blocks = $a.numElements();
         |int $nDt = $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $blocks; $i++) {
         |  int $c = $a.getInt($i);
         |  int $slot = $i * $cells + $c;
         |  if ($c < 0 || $c >= $cells || $slot >= $nDt) {
         |    throw new IllegalArgumentException(
         |      "adc_lookup: code " + $c + " at block " + $i + " out of range");
         |  }
         |  $sum += $b.getDouble($slot);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
