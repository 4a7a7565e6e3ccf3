package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.expressions.DotProduct

/** Optimizer rule: recognize the portable higher-order-function spelling
  * of a float32 dot product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0F, (acc, z) -> acc + z) }}}
  *
  * — and rewrite it to the native codegen kernel `dot_product(a, b)`.
  *
  * Deliberately more granular than [[RewriteHofL2Distance]]: the dot
  * product is the building block users compose into cosine similarity
  * (`dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`), norms, and plain
  * projections — rewriting the block accelerates every such spelling
  * without enumerating them. The kernel accumulates float32 in element
  * order exactly like the HOF chain, so results are bitwise identical;
  * the guard reproduces the HOF's NULL on length mismatch or null
  * elements.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isZeroFloat(e: Expression): Boolean = e match {
    case Literal(v: Float, FloatType) => v == 0f
    case _ => false
  }

  private def isPlainSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), args, _) =>
      args.map(_.exprId).toSet == Set(l.exprId, r.exprId)
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** zip lambda is `(x, y) -> x * y` over its own two arguments, in
    * either operand order.
    */
  private def isProduct(fn: Expression): Boolean = fn match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a1.exprId, a2.exprId)
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  private def hasNullElement(arr: Expression): Expression = {
    val x = NamedLambdaVariable("x", FloatType, nullable = true)
    ArrayExists(arr, LambdaFunction(IsNull(x), Seq(x)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, zipFn), zero, merge, finish)
        if isFloatArray(a) && isFloatArray(b) &&
          isProduct(zipFn) && isZeroFloat(zero) &&
          isPlainSum(merge) && isIdentity(finish) =>
      val sameLen: Expression = EqualTo(Size(a), Size(b))
      val clean: Expression =
        (mayHaveNullElements(a), mayHaveNullElements(b)) match {
          case (false, false) => sameLen
          case (true, false) => And(sameLen, Not(hasNullElement(a)))
          case (false, true) => And(sameLen, Not(hasNullElement(b)))
          case (true, true) =>
            And(sameLen, And(Not(hasNullElement(a)), Not(hasNullElement(b))))
        }
      If(clean, DotProduct(a, b), Literal(null, FloatType))
  }
}
