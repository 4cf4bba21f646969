package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
import graft.functions.{FloatVecDot, FloatVecNorm, ThetaEstimate,
  ThetaIntersectEstimate, ThetaSketchAgg, ThetaUnionEstimate,
  WordShingleHashes, ZOrder}

/** Engine extensions (SURVEY.md §2.J / §7.5): expose the native kernels
  * to the SQL surface and teach the optimizer to accelerate the
  * interpreted-lambda formulations.
  *
  * Two installation paths:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime, on an existing session: `GraftExtensions.install(spark)`
  *
  * Extension points used: SQL function registration, an optimizer rule
  * (lambda→kernel), and one planner strategy for the single operator
  * that genuinely benefits from its own physical plan —
  * graft.plans.TopKPerGroup (bounded per-group heaps; the built-in
  * window formulation sorts every row). Everything else plans onto
  * built-in physical operators (SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => AccelerateVectorLambdas)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  /** SQL-callable registrations of the native kernels: `vec_dot(a, b)`,
    * `vec_norm(a)`, `word_shingles(text, k)` — so `Lake.query` users get
    * the fast paths without touching the Scala API.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "vec_norm"),
      (es: Seq[Expression]) => FloatVecNorm(es.head)),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingles"),
      (es: Seq[Expression]) => {
        val k = es(1) match {
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"word_shingles k must be an int literal, got $other")
        }
        WordShingleHashes(es.head, k, distinct = true)
      }),
    // z-order key for SQL users: interleave two 8-bit bucket ids —
    // the same mask-shift cascade as ZOrder.morton2 (spec-asserted
    // equal), built as a raw Catalyst tree so it resolves through the
    // function registry and stays fully codegen'd
    (FunctionIdentifier("zorder2"),
      new ExpressionInfo(ZOrder.getClass.getName, "zorder2"),
      (es: Seq[Expression]) => {
        def spread8(c: Expression): Expression = {
          val s1 = BitwiseAnd(BitwiseOr(c, ShiftLeft(c, Literal(4))),
            Literal(0x0F0F))
          val s2 = BitwiseAnd(BitwiseOr(s1, ShiftLeft(s1, Literal(2))),
            Literal(0x3333))
          BitwiseAnd(BitwiseOr(s2, ShiftLeft(s2, Literal(1))),
            Literal(0x5555))
        }
        BitwiseOr(spread8(es(0)), ShiftLeft(spread8(es(1)), Literal(1)))
      }),
    // theta sketch set algebra for SQL users (ThetaAggs.scala): the
    // aggregate resolves through the registry and the analyzer wraps it
    // into an AggregateExpression; the scalar estimators run on compact
    // sketch bytes
    (FunctionIdentifier("theta_sketch"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch"),
      (es: Seq[Expression]) => ThetaSketchAgg(es.head)),
    (FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
      (es: Seq[Expression]) => ThetaEstimate(es.head)),
    (FunctionIdentifier("theta_intersect"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName,
        "theta_intersect"),
      (es: Seq[Expression]) => ThetaIntersectEstimate(es(0), es(1))),
    (FunctionIdentifier("theta_union"),
      new ExpressionInfo(classOf[ThetaUnionEstimate].getName, "theta_union"),
      (es: Seq[Expression]) => ThetaUnionEstimate(es(0), es(1))),
    // ---- Presto/Athena compat pack (round 12) ----
    // novlake's Lake.query passed raw Presto SQL to Athena; these shims
    // let the COMMON Presto-only function names keep working through
    // the Spark session — each resolves to the exact built-in Catalyst
    // tree (no UDFs, fully codegen'd). Only names Spark does NOT
    // define are shimmed: replacing a built-in (e.g. Presto's 3-arg
    // date_diff vs Spark's 2-arg) would silently change existing Spark
    // SQL, so conflicting names are deliberately left to their Spark
    // spellings (timestampdiff covers that one).
    (FunctionIdentifier("strpos"),
      new ExpressionInfo(classOf[StringLocate].getName, "strpos"),
      // Presto strpos(string, substring) — StringLocate takes
      // (substr, str): the argument order SWAPS
      (es: Seq[Expression]) => new StringLocate(es(1), es(0))),
    (FunctionIdentifier("to_unixtime"),
      new ExpressionInfo(classOf[Cast].getName, "to_unixtime"),
      // epoch seconds as DOUBLE (micros / 1e6), Presto semantics
      (es: Seq[Expression]) => Cast(es.head, DoubleType)),
    (FunctionIdentifier("json_extract_scalar"),
      new ExpressionInfo(classOf[GetJsonObject].getName,
        "json_extract_scalar"),
      (es: Seq[Expression]) => GetJsonObject(es(0), es(1))),
    (FunctionIdentifier("arbitrary"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.First]
          .getName, "arbitrary"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.aggregate
          .First(es.head, ignoreNulls = true)),
    (FunctionIdentifier("approx_distinct"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .HyperLogLogPlusPlus].getName, "approx_distinct"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.aggregate
          .HyperLogLogPlusPlus(es.head)),
    (FunctionIdentifier("map_agg"),
      new ExpressionInfo(classOf[MapFromEntries].getName, "map_agg"),
      // Presto map_agg(k, v) ≡ map_from_entries(collect_list(struct));
      // the inner aggregate must be wrapped explicitly — the analyzer
      // only auto-wraps an AggregateFunction returned at the TOP of a
      // registry builder
      (es: Seq[Expression]) => MapFromEntries(
        org.apache.spark.sql.catalyst.expressions.aggregate
          .CollectList(CreateStruct(Seq(es(0), es(1))))
          .toAggregateExpression())))

  /** Install on an already-running session (tests, notebooks). */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(AccelerateVectorLambdas)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AccelerateVectorLambdas
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
    }
  }
}

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *   aggregate(zip_with(a, b, (x, y) -> x·y), 0.0, (acc, v) -> acc + v)
  * over float vectors into the codegen'd FloatVecDot — the lambda form
  * evaluates interpreted (~10× slower, measured at sf0.1), so user
  * queries written the "natural" way silently get the kernel.
  * Arithmetic is identical (float→double widening, in-order sum).
  */
object AccelerateVectorLambdas extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** A lambda-variable reference widened to double: `CAST(v AS DOUBLE)`
    * (or `v` itself if it's already double). The cast must be INSIDE the
    * multiply: `(x,y) -> CAST(x*y AS DOUBLE)` multiplies in the float
    * domain then widens, which differs from the kernel's widen-then-
    * multiply in low-order bits — stripping an outer cast would make the
    * rewrite semantics-changing (ADVICE r1).
    */
  private def isDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(c, DoubleType, _, _) => stripCast(c).semanticEquals(v)
      case other => other.dataType == DoubleType && other.semanticEquals(v)
    }

  private def isElementProduct(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      // the multiply itself must be at DoubleType with each operand
      // individually widened from a lambda variable
      (isDoubleOf(l, x) && isDoubleOf(r, y)) ||
        (isDoubleOf(l, y) && isDoubleOf(r, x))
    case _ => false
  }

  private def isAccumulatingSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
      (l.semanticEquals(acc) && r.semanticEquals(el)) ||
        (l.semanticEquals(el) && r.semanticEquals(acc))
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) =>
      body.semanticEquals(v)
    case _ => false
  }

  /** (x) -> CAST(x)² with the widening inside the multiply — same
    * double-domain requirement as isElementProduct.
    */
  private def isElementSquare(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable), _) =>
      isDoubleOf(l, x) && isDoubleOf(r, x)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, product), Literal(0.0, DoubleType),
          merge, finish)
        if isFloatArray(a) && isFloatArray(b) &&
          isElementProduct(product) && isAccumulatingSum(merge) &&
          isIdentity(finish) =>
        FloatVecDot(a, b)
      // sqrt(aggregate(transform(a, x -> x²), 0.0, +)) → FloatVecNorm(a)
      case Sqrt(ArrayAggregate(ArrayTransform(a, square),
          Literal(0.0, DoubleType), merge, finish))
        if isFloatArray(a) && isElementSquare(square) &&
          isAccumulatingSum(merge) && isIdentity(finish) =>
        FloatVecNorm(a)
    }
}
