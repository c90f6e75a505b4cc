package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All sign-LSH table buckets of a vector in ONE fused loop
  * (SURVEY.md §2.G).
  *
  * `planes` is the full hyperplane tensor (tables × bits × dim). Earlier
  * the LSH paths built `tables × bits` separate [[ArrayDotProduct]] calls
  * against `tables × bits` literal arrays — thousands of literal doubles
  * in the plan, which cost seconds of Janino compilation PER PLAN and a
  * when-chain per bit at runtime. Here the tensor rides along as a single
  * flattened codegen reference object (`ctx.addReferenceObj`) — quantizer
  * state is data, not code — and one triple loop emits the bucket
  * bitmask per table: `bucket(t) = Σ_j [dot(vec, planes(t)(j)) >= 0] << j`.
  *
  * Accumulation order of each dot is sequential left-to-right, matching
  * [[ArrayDotProduct]] bit-for-bit, so bucket assignments are identical
  * to the column-algebra construction (spec-asserted). Vectors shorter
  * than `dim` fold over their prefix (zip semantics, as before).
  */
case class SignBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  @transient private lazy val tables = planes.length
  @transient private lazy val bits = planes.head.length
  @transient private lazy val dim = planes.head.head.length
  /** Row-major (table, bit, dim) flattening shared by eval and codegen. */
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if planes.nonEmpty && planes.head.nonEmpty && planes.head.head.nonEmpty &&
          planes.forall(t => t.length == bits && t.forall(_.length == dim)) &&
          bits <= 31 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName planes must be a non-empty rectangular tables x bits x dim tensor with bits <= 31")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val off = (t * bits + j) * dim
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getDouble(d) * flat(off + d); d += 1 }
        if (dot >= 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("signPlanes", flat, "double[]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $off = ($t * $bits + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += $v.getDouble($d) * $ref[$off + $d];
         |    }
         |    if ($dot >= 0.0) $bucket |= 1 << $j;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
