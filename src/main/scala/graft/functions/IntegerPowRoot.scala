package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact rational-exponent integer power: `floor(x^(p/q))` computed as
  * the q-th integer root of x^p in arbitrary-precision arithmetic — no
  * floating point anywhere, so the value is deterministic at ANY
  * magnitude (a libm `pow` differs across platforms near halfway
  * points, which is exactly where a floor sits).
  *
  * The general-τ temperature-mixing kernel: a τ = p/q source weight is
  * `int_pow_root(mass, p, q)` — exact for τ = 0.3 (3/10), 0.7 (7/10),
  * or any rational, at 100 TB masses where x^p is far past 128 bits
  * (BigInteger carries the intermediate; the per-row cost is irrelevant
  * because the callers run on per-SOURCE aggregates — metadata
  * cardinality, never the corpus).
  *
  * Newton's q-th root iteration with an over-estimate seed (monotone
  * decreasing ⇒ termination), then a two-sided floor adjustment — spec
  * pinned against BigInt `pow`-and-compare replays and against
  * `floor(sqrt(x))` at p/q = 1/2.
  */
case class IntegerPowRoot(child: Expression, p: Int, q: Int) extends UnaryExpression {

  require(q > 0, s"int_pow_root: q must be positive, got $q")
  require(p > 0, s"int_pow_root: p must be positive, got $p")
  require(p <= q,
    s"int_pow_root: p/q must be <= 1 so the result fits a long for any long input, got $p/$q")

  override def dataType: DataType = LongType
  override def prettyName: String = "int_pow_root"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    IntegerPowRoot.powRoot(input.asInstanceOf[Long], p, q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.IntegerPowRoot.powRoot($x, $p, $q);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IntegerPowRoot {

  /** floor((x^p)^(1/q)) for x >= 0; raises on negative input (a mass
    * weight has no negative domain — silent null would hide a broken
    * upstream aggregate). */
  def powRoot(x: Long, p: Int, q: Int): Long = {
    if (x < 0) throw new IllegalArgumentException(
      s"int_pow_root: input must be non-negative, got $x")
    if (x == 0L) return 0L
    if (x == 1L || p == q) return if (p == q) x else 1L
    nthRoot(BigInteger.valueOf(x).pow(p), q).longValueExact()
  }

  /** floor(v^(1/n)) by Newton iteration. Seed 2^(ceil(bitlen/n)) is
    * always an over-estimate; the iterate is strictly decreasing while
    * above the root, so the loop terminates at or one below the floor,
    * and the adjustment loops settle it exactly. */
  private[graft] def nthRoot(v: BigInteger, n: Int): BigInteger = {
    val bn = BigInteger.valueOf(n.toLong)
    val bn1 = BigInteger.valueOf((n - 1).toLong)
    var r = BigInteger.ONE.shiftLeft(v.bitLength() / n + 1)
    var done = false
    while (!done) {
      val next = r.multiply(bn1).add(v.divide(r.pow(n - 1))).divide(bn)
      if (next.compareTo(r) >= 0) done = true else r = next
    }
    while (r.pow(n).compareTo(v) > 0) r = r.subtract(BigInteger.ONE)
    while (r.add(BigInteger.ONE).pow(n).compareTo(v) <= 0) r = r.add(BigInteger.ONE)
    r
  }
}
