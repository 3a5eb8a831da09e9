package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash/similarity hot paths.
  *
  * Preference order per the build mandate: built-ins → native Expression
  * with doGenCode → UDF. These are the (b) tier: the composed
  * higher-order-function versions in ops/ remain as executable
  * specifications, but for 100 TB-scale scans the per-row cost must be one
  * tight JVM loop. Codegen emits a single static call into
  * [[HashKernels]] — the same pattern as Spark's own xxhash64 → XXH64 —
  * so whole-stage codegen keeps the expression inline (no UDF
  * serialization boundary, no interpreted lambda trees).
  */
object NativeExpressions {

  /** minhash signature: `graft_minhash(text, shingleSize, numHashes, seed)`. */
  final case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    @transient private lazy val params = HashKernels.affineParams(numHashes, seed)

    override def nullSafeEval(input: Any): Any = {
      val hashes = HashKernels.shingleHashes31(input.asInstanceOf[UTF8String], shingleSize)
      new GenericArrayData(HashKernels.minHashSignature(hashes, params._1, params._2))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val asRef = ctx.addReferenceObj("minhashAs", params._1, "long[]")
        val bsRef = ctx.addReferenceObj("minhashBs", params._2, "long[]")
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.HashKernels.minHashSignature(
           |    graft.functions.HashKernels.shingleHashes31($c, $shingleSize), $asRef, $bsRef));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit simhash: `graft_simhash64(text, shingleSize)`. */
  final case class SimHash64(child: Expression, shingleSize: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(input: Any): Any =
      HashKernels.simHash64(HashKernels.shingleHashes64(input.asInstanceOf[UTF8String], shingleSize))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashKernels.simHash64(graft.functions.HashKernels.shingleHashes64($c, $shingleSize))")

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Character-distribution Shannon entropy (nats):
    * `graft_char_entropy(text)` → double. Bit-parity with the HOF
    * formulation in [[graft.ops.TextOps.charEntropy]] (kept as the
    * executable spec); one byte scan replaces an O(len·alphabet)
    * interpreted-lambda histogram per row.
    */
  final case class CharEntropy(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_char_entropy"

    override def nullSafeEval(input: Any): Any =
      HashKernels.charEntropy(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charEntropy($c)")

    override protected def withNewChildInternal(newChild: Expression): CharEntropy =
      copy(child = newChild)
  }

  /** Exact distinct word-n-gram count:
    * `graft_distinct_ngrams(text, n)` → int. Equals
    * `size(DedupOps.shingles(text, n))` (string-equality distinct, not
    * hash-distinct) — the numerator of the repetition filter.
    */
  final case class DistinctNgrams(child: Expression, n: Int) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_distinct_ngrams"

    override def nullSafeEval(input: Any): Any =
      HashKernels.distinctShingleCount(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.distinctShingleCount($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): DistinctNgrams =
      copy(child = newChild)
  }

  /** Sliding-window Bloom membership:
    * `graft_bloom_text_hit(text, bloomWords, probeLen, numHashes)` →
    * boolean — true iff ANY probeLen-character window of `text` might be
    * in the filter (see [[HashKernels.bloomTextHit]]). The filter words
    * arrive as a COLUMN (from the one-row [[BloomBuildAgg]] result
    * broadcast-joined onto the scan), read in place with no per-row copy.
    */
  final case class BloomTextHit(left: Expression, right: Expression, probeLen: Int, numHashes: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, array<bigint>) inputs")
      }
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_text_hit"

    override def nullSafeEval(text: Any, bits: Any): Any =
      HashKernels.bloomTextHit(text.asInstanceOf[UTF8String],
        bits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], probeLen, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, b) =>
        s"graft.functions.HashKernels.bloomTextHit($t, $b, $probeLen, $numHashes)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomTextHit =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity of two array<float>: `graft_cosine(a, b)`. */
  final case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float> columns")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.cosineFloat(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray())

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashKernels.cosineFloat($a.toFloatArray(), $b.toFloatArray())")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Multi-table sign-LSH bucket ids:
    * `graft_signbuckets(vec, dim, numPlanes, tables, seed)` → array<long>
    * of length `tables`. One tight loop replaces a tables×planes forest of
    * literal-array fold expressions — same result, but O(100) bytes of
    * generated code instead of a Janino compile of the whole plane set.
    */
  final case class SignBuckets(child: Expression, dim: Int, numPlanes: Int, tables: Int, seed: Long)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> column")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_signbuckets"

    @transient private lazy val planes = HashKernels.lshPlanes(dim, numPlanes, tables, seed)

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(HashKernels.signBuckets(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
        planes, dim, numPlanes, tables))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.HashKernels.signBuckets(
           |    $c.toFloatArray(), $planesRef, $dim, $numPlanes, $tables));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SignBuckets =
      copy(child = newChild)
  }

  /** IVF probe selection:
    * `graft_nearest_cells(vec, array(array(...), ...), nProbe)` →
    * array<int> of the nProbe nearest centroid ids. The centroid argument
    * must be a foldable nested-array literal (the coarse quantizer is
    * small by construction); one loop replaces an nLists-wide forest of
    * literal-array distance folds.
    */
  final case class NearestCells(child: Expression, centroids: Array[Double], nLists: Int, dim: Int, nProbe: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> column")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_nearest_cells"

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(HashKernels.nearestCells(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
        centroids, nLists, dim, nProbe))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val centroidsRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.HashKernels.nearestCells(
           |    $c.toFloatArray(), $centroidsRef, $nLists, $dim, $nProbe));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
  }

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  // seeds are 64-bit: routing them through intArg would silently truncate
  // and diverge from the HOF executable specs
  private def longArg(e: Expression, name: String): Long = e.eval() match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples in the shape SparkSessionExtensions
    * and FunctionRegistry both accept. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args.head,
        if (args.length > 1) intArg(args(1), "shingleSize") else 3,
        if (args.length > 2) intArg(args(2), "numHashes") else 64,
        if (args.length > 3) longArg(args(3), "seed") else 42L)),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head,
        if (args.length > 1) intArg(args(1), "shingleSize") else 2)),
    (FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      (args: Seq[Expression]) => CharEntropy(args.head)),
    (FunctionIdentifier("graft_distinct_ngrams"),
      new ExpressionInfo(classOf[DistinctNgrams].getName, "graft_distinct_ngrams"),
      (args: Seq[Expression]) => {
        val n = if (args.length > 1) intArg(args(1), "n") else 3
        require(n > 0, s"graft_distinct_ngrams requires n > 0, got $n")
        DistinctNgrams(args.head, n)
      }),
    (FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_build"),
      (args: Seq[Expression]) => BloomBuildAgg(args.head,
        intArg(args(1), "numBits"), intArg(args(2), "numHashes"))),
    (FunctionIdentifier("graft_bloom_text_hit"),
      new ExpressionInfo(classOf[BloomTextHit].getName, "graft_bloom_text_hit"),
      (args: Seq[Expression]) => {
        val probeLen = intArg(args(2), "probeLen")
        val numHashes = intArg(args(3), "numHashes")
        require(probeLen > 0, s"graft_bloom_text_hit requires probeLen > 0, got $probeLen")
        require(numHashes > 0, s"graft_bloom_text_hit requires numHashes > 0, got $numHashes")
        BloomTextHit(args(0), args(1), probeLen, numHashes)
      }),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    (FunctionIdentifier("graft_signbuckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "graft_signbuckets"),
      (args: Seq[Expression]) => SignBuckets(args.head,
        intArg(args(1), "dim"), intArg(args(2), "numPlanes"),
        intArg(args(3), "tables"), longArg(args(4), "seed"))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByValue].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKByValue(args(0), args(1), intArg(args(2), "k"))),
    (FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "graft_freq_sketch"),
      (args: Seq[Expression]) => FreqSketch(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (args: Seq[Expression]) => {
        require(args(1).foldable, "graft_nearest_cells centroids must be a literal nested array")
        val nested = args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val rows = (0 until nested.numElements()).map(i =>
          nested.getArray(i).toDoubleArray())
        require(rows.nonEmpty, "graft_nearest_cells requires at least one centroid")
        val dim = rows.head.length
        // a ragged centroid list would silently misindex the flattened buffer
        require(rows.forall(_.length == dim),
          s"graft_nearest_cells centroids must all have dimension $dim")
        val nProbe = intArg(args(2), "nProbe")
        // fail at analysis time with a clear message — a negative value
        // would otherwise surface as NegativeArraySizeException mid-task
        require(nProbe > 0, s"graft_nearest_cells requires nProbe > 0, got $nProbe")
        NearestCells(args.head, rows.flatten.toArray, rows.length, dim, nProbe)
      })
  )

  /** Idempotent runtime registration (for sessions built without the
    * extensions config). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    }
  }
}

/** Session-extension entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (builder or
  * config file) and the functions resolve in every session, including
  * SQL-only clients.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    NativeExpressions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinLimitPushdown)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}
