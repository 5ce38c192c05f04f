package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for the vector hot path.
  *
  * Spark's array higher-order functions (`aggregate`/`zip_with`) are
  * interpreted per element — fine for correctness, a 10-100× cliff on a
  * 64-dim dot product evaluated millions of times (observed in profiles:
  * tasks pinned in `CaseWhen.eval`/`nullSafeEval`). This expression
  * participates in whole-stage codegen: the generated Java is the same
  * tight sequential loop the DuckDB oracle's `list_reduce` fold runs, so
  * results stay bit-identical while the evaluation is JIT-compiled.
  *
  * Accumulation order is left-to-right, exactly like
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — required for cross-engine
  * double determinism. Null elements are treated as 0.0 (embeddings are
  * dense; nulls cannot occur in the supported input).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity — ONE traversal computing the three sums the
  * composed form `vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))`
  * needs three traversals for. Each accumulator adds the SAME terms in
  * the SAME left-to-right order as its standalone vec_dot, and the final
  * combine is the identical IEEE expression (`/`, `*`,
  * `java.lang.Math.sqrt`), so results are bit-identical to the composed
  * form — the DuckDB oracle twins ([[graft.queries.Vectors.cosineSql]])
  * stay valid unchanged. Per pair on 64-dim embeddings this removes two
  * array traversals and their bounds/null checks from the brute-force
  * similarity hot loops (every crossJoin recall harness pays this
  * per-candidate), and shrinks the generated code (three loops → one),
  * which also shortens the C2 warm-up that dominates q_sim_jl's
  * measured variance. Length mismatch follows the composed form
  * exactly: the cross term stops at min(n, m), each norm runs over its
  * own full array.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    val m = math.max(nx, ny)
    while (i < m) {
      if (i < n && !x.isNullAt(i) && !y.isNullAt(i)) {
        ab += x.getDouble(i) * y.getDouble(i)
      }
      if (i < nx && !x.isNullAt(i)) { val v = x.getDouble(i); aa += v * v }
      if (i < ny && !y.isNullAt(i)) { val v = y.getDouble(i); bb += v * v }
      i += 1
    }
    ab / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val v = ctx.freshName("v")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |int $m = java.lang.Math.max($nx, $ny);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($i < $n && !$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $ab += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($i < $nx && !$a.isNullAt($i)) {
         |    double $v = $a.getDouble($i); $aa += $v * $v;
         |  }
         |  if ($i < $ny && !$b.isNullAt($i)) {
         |    double $v = $b.getDouble($i); $bb += $v * $v;
         |  }
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL surface for the vector expressions. Uses only the
  * public `call_function` bridge: [[register]] installs the expression
  * builder in the session's function registry (idempotent), and the
  * Column helpers resolve through it at analysis time.
  */
object VectorFunctions {

  val info = new ExpressionInfo(classOf[DotProduct].getName, "vec_dot")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot takes 2 arguments, got ${other.length}")
  }

  val cosineInfo = new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine")

  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSim(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_cosine takes 2 arguments, got ${other.length}")
  }

  /** Install vec_dot/vec_cosine into the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("vec_dot"), info, builder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("vec_cosine"), cosineInfo, cosineBuilder)
  }

  /** Codegen'd sequential dot product of two array<double> columns.
    * Requires [[register]] on the session (Tables.load does it). */
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  /** Fused single-traversal cosine — bit-identical to
    * `vecDot(a,b) / (vecNorm(a) * vecNorm(b))` (see [[CosineSim]]). */
  def vecCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_cosine", a, b)
}

/** `SparkSessionExtensions` hook: makes `vec_dot` callable from SQL
  * (`SELECT vec_dot(a, b)`) when the session is built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the reserved Catalyst optimizer surface (SURVEY §4): canonicalize
    // the reference's text-typed optional-filter equality into sargable
    // predicates — see graft.plans.UnwrapStringCast
    ext.injectOptimizerRule(_ => graft.plans.UnwrapStringCast)
    // vectorize naive non-equi band joins (nested-loop → bucketed
    // equi-join) — see graft.plans.BandJoinRewrite
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"), VectorFunctions.info, VectorFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      VectorFunctions.cosineInfo, VectorFunctions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect"),
      BoundedCollectFunctions.info, BoundedCollectFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"), TopKByFunctions.info, TopKByFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"), TextFunctions.info, TextFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"), MinhashFunctions.info, MinhashFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("gram_tri"), GramTriFunctions.info, GramTriFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("byte_at"), ByteFunctions.info, ByteFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("dib_row_sums"),
      DibFunctions.rowSumsInfo, DibFunctions.rowSumsBuilder))
    ext.injectFunction((
      FunctionIdentifier("dib_ahash"),
      DibFunctions.aHashInfo, DibFunctions.aHashBuilder))
  }
}
