package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array<string> elements that belong to a fixed word set —
  * the stopword-hit kernel behind language ID and quality scoring.
  *
  * Value-identical to
  * `size(filter(tokens, t -> array_contains(lit_words, t)))` (a null
  * element makes `array_contains` null, which `filter` treats as
  * false — here a null element is simply not counted), but ONE
  * codegen'd hash-set loop per row instead of an interpreted
  * higher-order `ArrayFilter` (CodegenFallback), which breaks the
  * whole-stage span and pays lambda dispatch plus a linear
  * `array_contains` scan per token. TextOpsSpec pins the differential
  * identity against the HOF form.
  *
  * The word set is plan-time state: the word LIST serializes with the
  * expression; the probe set is rebuilt lazily per JVM. */
case class StopwordHits(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  // analysis-time gate: a non-array<string> child would otherwise fail
  // at EXECUTION time with a ClassCastException (or worse, compare raw
  // bytes of a non-string type against the UTF8String set)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Membership probe for generated code. */
  def hit(u: UTF8String): Boolean = set.contains(u)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $ref.hit($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
