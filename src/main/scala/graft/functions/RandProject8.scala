package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused int8-quantize + 8-way random projection (SURVEY.md §2.G): the
  * whole per-row kernel of `embed_project_rand` in ONE pass over the
  * vector.
  *
  * Replaces the column-algebra pipeline — `array_max(transform(abs))`,
  * two quantize `transform`s, then `transform(sequence(0,7), d ->
  * aggregate(sequence(0, dim-1), ...))` — which evaluated 8 x dim
  * interpreted lambda bindings per row (HOFs sit outside whole-stage
  * codegen) and allocated four intermediate arrays. Bit-identical by
  * construction, differential-tested against the algebra form in
  * SimilaritySpec:
  *   maxabs = max_j |vec[j]|
  *   q[j]   = maxabs == 0 ? 0 : round(vec[j] / maxabs * 127)   (HALF_UP)
  *   y[d]   = sum_j q[j] * (((j*131 + d*17 + j*d*29) mod 257) mod 7 - 3)
  * The rounding replicates Spark's `Round` on doubles exactly — decimal
  * HALF_UP via `BigDecimal.valueOf` — through a guarded fast path:
  * floor/ceil of x +/- 0.5 away from zero, deferring to BigDecimal only
  * within 1e-9 of a .5 halfway point (where binary +/-0.5 arithmetic
  * could round across the boundary that the decimal shortest-repr
  * string does not).
  *
  * Empty vectors yield the all-zero projection (the algebra form is
  * undefined there — `array_max(empty)` is null — and no table produces
  * one); null ELEMENTS throw, as a wrong-but-plausible projection is
  * worse than a loud failure.
  */
case class RandProject8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rand_project8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got $other")
  }

  /** Public so generated code can call it through a reference object. */
  def compute(input: ArrayData): ArrayData = {
    val len = input.numElements()
    val y = new Array[Long](8)
    var maxabs = 0.0
    var j = 0
    while (j < len) {
      if (input.isNullAt(j))
        throw new IllegalArgumentException(
          s"$prettyName: null element at index $j")
      val a = math.abs(input.getDouble(j))
      if (a > maxabs) maxabs = a
      j += 1
    }
    if (maxabs != 0.0) {
      j = 0
      while (j < len) {
        val q = RandProject8.roundHalfUp(input.getDouble(j) / maxabs * 127.0)
        if (q != 0L) {
          val j131 = j * 131
          var d = 0
          while (d < 8) {
            y(d) += q * (((j131 + d * 17 + j * d * 29) % 257) % 7 - 3)
            d += 1
          }
        }
        j += 1
      }
    }
    new GenericArrayData(y)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("projector", this, classOf[RandProject8].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandProject8 {
  /** Spark `Round(double, 0)` semantics: decimal HALF_UP on the
    * shortest decimal representation. Fast path is away-from-zero
    * binary rounding; only near-halfway inputs (|frac - 0.5| < 1e-9,
    * where the two definitions can disagree) pay the BigDecimal. */
  def roundHalfUp(x: Double): Long = {
    val ax = math.abs(x)
    val frac = ax - math.floor(ax)
    if (math.abs(frac - 0.5) < 1e-9)
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    else if (x >= 0) math.floor(x + 0.5).toLong
    else math.ceil(x - 0.5).toLong
  }
}
