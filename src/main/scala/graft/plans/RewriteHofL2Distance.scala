package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.L2SqDistance

/** Optimizer rule: recognize the portable higher-order-function spelling
  * of Euclidean distance —
  *
  * {{{ sqrt(aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0F, (acc, z) -> acc + z)) }}}
  *
  * — and rewrite it to the native codegen kernel
  * `sqrt(cast(l2_sq_distance(a, b) as double))`.
  *
  * The kernel accumulates float32 in element order exactly like the HOF
  * chain does, so the rewrite is bitwise result-preserving while
  * replacing the lambda-evaluator machinery (per-element
  * `NamedLambdaVariable` binding) with a tight loop over `ArrayData`.
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (see [[graft.GraftExtensions]]).
  */
object RewriteHofL2Distance extends Rule[LogicalPlan] {

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(v: Float, FloatType) => v == 0f
    case Literal(v: Double, DoubleType) => v == 0d
    case _ => false
  }

  /** merge lambda is a plain `acc + z` (either argument order). */
  private def isPlainSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), args, _) =>
      args.map(_.exprId).toSet == Set(l.exprId, r.exprId)
    case _ => false
  }

  /** finish lambda is the identity `acc -> acc`. */
  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** zip lambda is `(x, y) -> (x-y)*(x-y)` over its own two arguments. */
  private def isSquaredDiff(fn: Expression): Boolean = fn match {
    case LambdaFunction(
        Multiply(Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
          Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
        x1.exprId == a1.exprId && y1.exprId == a2.exprId
    case _ => false
  }

  /** The float-typed aggregate reaches sqrt through an implicit
    * double-cast — match the aggregate with or without that wrapper.
    */
  private object MaybeDoubleCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(child, DoubleType, _, _) => Some(child)
      case other => Some(other)
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** `exists(arr, x -> isnull(x))` built post-analysis. */
  private def hasNullElement(arr: Expression): Expression = {
    val x = NamedLambdaVariable("x", FloatType, nullable = true)
    ArrayExists(arr, LambdaFunction(IsNull(x), Seq(x)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // only array<float> (the kernel is float32; rewriting double arrays
    // would change results and produce an unresolved plan)
    case Sqrt(MaybeDoubleCast(ArrayAggregate(ZipWith(a, b, zipFn), zero, merge, finish)))
        if isFloatArray(a) && isFloatArray(b) &&
          isSquaredDiff(zipFn) && isZeroLit(zero) &&
          isPlainSum(merge) && isIdentity(finish) =>
      // the HOF yields NULL for mismatched lengths (zip_with null-pads)
      // or null elements — guard so the kernel only runs on the clean
      // case and NULL semantics are preserved exactly
      val sameLen: Expression = EqualTo(Size(a), Size(b))
      val clean: Expression =
        (mayHaveNullElements(a), mayHaveNullElements(b)) match {
          case (false, false) => sameLen
          case (true, false) => And(sameLen, Not(hasNullElement(a)))
          case (false, true) => And(sameLen, Not(hasNullElement(b)))
          case (true, true) =>
            And(sameLen, And(Not(hasNullElement(a)), Not(hasNullElement(b))))
        }
      If(clean, Sqrt(Cast(L2SqDistance(a, b), DoubleType)), Literal(null, DoubleType))
  }
}
