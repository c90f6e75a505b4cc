package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of all n-word shingles of a words array in ONE
  * fused pass (SURVEY.md §2.G) — the scan-side kernel of every shingle
  * miner (Jaccard, containment, MinHash, incremental dedup).
  *
  * Replaces the column-algebra pipeline
  * `transform(array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", slice(words, i, n)))), s -> xxhash64(s))`, which
  * evaluates four nested higher-order functions INTERPRETED per row
  * (HOFs sit outside whole-stage codegen) and allocates three
  * intermediate arrays. Bit-identical by construction: shingle i is
  * words[i .. min(i+n, len)-1] joined by a single space (slice
  * semantics, so a words array shorter than n yields its single
  * full-array shingle, and an EMPTY array yields the hash of ""),
  * hashed with Spark's xxhash64 (XXH64, seed 42) over the UTF8 bytes.
  * The output is the SORTED distinct hash set (not array_distinct's
  * first-occurrence order): no consumer depends on shingle order — the
  * hashes feed minhash lanes, posting explodes, sizes and
  * array_intersect counts, all order-free — and sort+unique over a
  * primitive long[] avoids the boxed per-row hash-set churn that
  * measurably fed GC on plans evaluating this six times per corpus
  * scan. The set-equality contract vs the algebra form is
  * differential-tested in DedupSpec.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle_hash64: n must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got $other")
  }

  /** Per-thread scratch buffer for shingle bytes: expression instances are
    * shared across tasks in one JVM, and reusing the buffer keeps the hot
    * loop allocation-free (it only grows, bounded by the longest shingle). */
  @transient private lazy val scratch =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](256))

  /** Public so generated code can call it through a reference object. */
  def compute(input: ArrayData): ArrayData = {
    val len = input.numElements()
    val count = math.max(len - n + 1, 1)
    val hashes = new Array[Long](count)
    var buf = scratch.get()
    var i = 0
    while (i < count) {
      val end = math.min(i + n, len)
      // byte-assemble "w_i w_{i+1} ... " exactly as concat_ws would
      var blen = 0
      var j = i
      while (j < end) {
        val w = input.getUTF8String(j)
        val wlen = w.numBytes()
        val need = blen + wlen + 1
        if (need > buf.length) {
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          scratch.set(buf)
        }
        if (j > i) { buf(blen) = ' '.toByte; blen += 1 }
        w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + blen)
        blen += wlen
        j += 1
      }
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, 42L)
      i += 1
    }
    // sort + in-place unique over primitives (no boxing)
    java.util.Arrays.sort(hashes)
    var uniq = 0
    var k = 0
    while (k < count) {
      if (k == 0 || hashes(k) != hashes(k - 1)) { hashes(uniq) = hashes(k); uniq += 1 }
      k += 1
    }
    new GenericArrayData(
      if (uniq == count) hashes else java.util.Arrays.copyOf(hashes, uniq))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHash64].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
