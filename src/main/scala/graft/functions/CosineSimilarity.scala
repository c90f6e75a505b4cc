package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst cosine-similarity expression (SURVEY.md §2.G).
  *
  * One fused loop computes dot, ||a||², ||b||² in a single pass over the two
  * arrays — no intermediate arrays, no lambda-function call overhead — and
  * `doGenCode` keeps it inside WholeStageCodegen. Accumulation order is
  * sequential left-to-right, matching [[VectorOps.cosine]] bit-for-bit.
  *
  * Semantics: both inputs must be array<double>, enforced at ANALYSIS time
  * via checkInputDataTypes (the builders in [[GraftFunctions]] insert a
  * widening Cast for float arrays — exact). Mismatched lengths fold over
  * the common prefix (zip semantics); a zero-norm input yields NaN (0/0),
  * the IEEE answer for an undefined angle — filter zero vectors upstream
  * if another policy is needed.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>) inputs, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SQL registration for graft's native expressions. */
object GraftFunctions {
  val cosineSimBuilder: Seq[Expression] => Expression = exprs =>
    CosineSimilarity(
      Cast(exprs.head, ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))

  val dotProductBuilder: Seq[Expression] => Expression = exprs =>
    ArrayDotProduct(
      Cast(exprs.head, ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))

  val simHash64Builder: Seq[Expression] => Expression = exprs => SimHash64(exprs.head)

  /** minhash_sig(hashes, k): k must be a foldable int literal — it sizes
    * the signature buffer at plan time. */
  val minHashSigBuilder: Seq[Expression] => Expression = exprs =>
    MinHashSignature(exprs.head, exprs(1).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"minhash_sig k must be an integer literal, got $other")
    })

  val md5Hash64Builder: Seq[Expression] => Expression = exprs => Md5Hash64Array(exprs.head)

  /** bloom_filter_agg(xxhash64(key)[, estimatedItems[, numBits]]) —
    * Spark's own runtime-filter sketch aggregate
    * (catalyst BloomFilterAggregate), surfaced as a SQL function so a
    * scalar subquery can build a corpus bloom filter IN-PLAN (partial
    * per-partition blooms OR-merged map-side — one pass, no shuffle of
    * the keyed data). The analyzer wraps the bare AggregateFunction. */
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(c) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
    case Seq(c, n) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        c, n, org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(
            n.eval().asInstanceOf[Number].longValue(), 0.03)))
    case Seq(c, n, m) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, m)
    case other => throw new IllegalArgumentException(
      s"bloom_filter_agg takes 1-3 arguments, got ${other.size}")
  }

  /** bloom_might_contain(bloomScalarSubquery, xxhash64(key)) — codegen'd
    * probe (catalyst BloomFilterMightContain); the bloom side must be a
    * scalar subquery or constant, enforced by its own type check. */
  val bloomMightContainBuilder: Seq[Expression] => Expression = exprs =>
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs.head, exprs(1))

  /** sign_buckets(vec, planes): planes must be a foldable
    * array<array<array<double>>> literal — it is plan-time quantizer
    * state, embedded in the expression as a reference object. */
  val signBucketsBuilder: Seq[Expression] => Expression = exprs => {
    def bad(msg: String) = throw new IllegalArgumentException(s"sign_buckets: $msg")
    val cast = Cast(exprs(1), ArrayType(ArrayType(ArrayType(DoubleType))))
    if (!cast.foldable)
      bad("planes must be a FOLDABLE array<array<array<double>>> literal " +
        "(plan-time quantizer state), got a non-foldable expression")
    // a NULL literal (or null nested table/plane/component) would
    // otherwise surface as a raw MatchError from the extractor
    val planes = cast.eval() match {
      case null => bad("planes literal must not be NULL"); Nil
      case ad: ArrayData => ad.toObjectArray(ArrayType(ArrayType(DoubleType))).toSeq.map {
        case t: ArrayData => t.toObjectArray(ArrayType(DoubleType)).toSeq.map {
          case p: ArrayData =>
            val arr = p.toObjectArray(DoubleType)
            if (arr.contains(null)) bad("plane components must not be NULL")
            arr.toSeq.map(_.asInstanceOf[Double])
          case _ => bad("planes contains a NULL plane"); Nil
        }
        case _ => bad("planes contains a NULL table"); Nil
      }
      case other => bad(s"planes must be a nested array literal, got $other"); Nil
    }
    SignBuckets(Cast(exprs.head, ArrayType(DoubleType)), planes)
  }

  /** Idempotent runtime SQL registration on an existing session (the driver
    * owns session construction, so extensions alone aren't enough). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", cosineSimBuilder, "built-in")
    reg.createOrReplaceTempFunction("dot_product", dotProductBuilder, "built-in")
    reg.createOrReplaceTempFunction("simhash64", simHash64Builder, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", minHashSigBuilder, "built-in")
    reg.createOrReplaceTempFunction("md5_hash64_array", md5Hash64Builder, "built-in")
    reg.createOrReplaceTempFunction("sign_buckets", signBucketsBuilder, "built-in")
    reg.createOrReplaceTempFunction("bloom_filter_agg", bloomAggBuilder, "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain", bloomMightContainBuilder, "built-in")
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Column handles — built directly on the expressions, no registry needed. */
  def cosineSim(a: Column, b: Column): Column = toCol(cosineSimBuilder(Seq(toExpr(a), toExpr(b))))
  def dotProduct(a: Column, b: Column): Column = toCol(dotProductBuilder(Seq(toExpr(a), toExpr(b))))
  def simHash64(hashes: Column): Column = toCol(SimHash64(toExpr(hashes)))
  def minHashSig(hashes: Column, k: Int): Column = toCol(MinHashSignature(toExpr(hashes), k))
  def md5Hash64Array(tokens: Column): Column = toCol(Md5Hash64Array(toExpr(tokens)))
  def signBuckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    toCol(SignBuckets(toExpr(vec), planes))
  def adcLookup(codes: Column, dt: Column, cells: Int): Column =
    toCol(AdcLookup(toExpr(codes), toExpr(dt), cells))
  def shingleHash64(words: Column, n: Int): Column =
    toCol(ShingleHash64(toExpr(words), n))
  def randProject8(vec: Column): Column =
    toCol(RandProject8(toExpr(vec)))
  def rollingHashFp(text: Column): Column =
    toCol(RollingHashFp(toExpr(text)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))
  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    toCol(StopwordHits(toExpr(tokens), words))
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
  * spark.sql.extensions=graft.functions.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        GraftFunctions.cosineSimBuilder))
    ext.injectFunction(
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, "dot_product"),
        GraftFunctions.dotProductBuilder))
    ext.injectFunction(
      (FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        GraftFunctions.simHash64Builder))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
        GraftFunctions.minHashSigBuilder))
    ext.injectFunction(
      (FunctionIdentifier("md5_hash64_array"),
        new ExpressionInfo(classOf[Md5Hash64Array].getName, "md5_hash64_array"),
        GraftFunctions.md5Hash64Builder))
    ext.injectFunction(
      (FunctionIdentifier("sign_buckets"),
        new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
        GraftFunctions.signBucketsBuilder))
    ext.injectFunction(
      (FunctionIdentifier("bloom_filter_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "bloom_filter_agg"),
        GraftFunctions.bloomAggBuilder))
    ext.injectFunction(
      (FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "bloom_might_contain"),
        GraftFunctions.bloomMightContainBuilder))
  }
}
