package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.VectorExprs.{DotProduct, L2DistSq, L2NormSq}

/** Optimizer auto-vectorization: rewrites the canonical higher-order-function
  * spellings of the vector hot paths into the engine's native codegen
  * expressions, so a user who writes the idiomatic-but-interpreted
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *   aggregate(transform(a, x -> x * x),        0.0d, (acc, v) -> acc + v)
  *
  * gets `graft_dot(a, b)` / `graft_normsq(a)` — one primitive double loop
  * inside whole-stage codegen instead of a per-element interpreted lambda
  * (ArrayAggregate is CodegenFallback) — without changing a line of query
  * code. Injected through `GraftExtensions.injectOptimizerRule`, the
  * engine-extension layer beside the function registry.
  *
  * Safety: the rewrite fires only on the EXACT shape above with
  * array<double> inputs and a 0.0 double seed. The native expressions
  * accumulate strictly left-to-right in double — the same fold order as
  * ArrayAggregate — and IEEE multiply/add are commutative in their operand
  * pair, so accepting (x·y | y·x) and (acc+v | v+acc) cannot change a bit
  * of the result. Null-element handling differs in one documented corner:
  * the HOF propagates a null element into a null total, the native loop
  * skips null elements — so the rewrite additionally requires
  * `containsNull = false` on the array types (harness vectors; anything
  * nullable keeps the HOF). Unequal lengths need no schema guard because
  * DotProduct itself returns NULL on length mismatch — the same value the
  * HOF produces when zip_with null-pads the shorter array (jagged case in
  * HofVectorizeSpec). HofVectorizeSpec asserts plan shape AND
  * bit-identical results both ways.
  */
object HofVectorize extends Rule[LogicalPlan] {

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** (x, y) -> x * y (either operand order), over exactly the two lambda
    * args. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(p.exprId, q.exprId)
    case _ => false
  }

  /** (x, y) -> (x - y) * (x - y): both factors the SAME subtraction (either
    * operand orientation — (x−y)² ≡ (y−x)² exactly: IEEE negation is exact
    * and the square is a single rounding either way). */
  private def isPairDiffSquare(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(
        Subtract(a1: NamedLambdaVariable, b1: NamedLambdaVariable, _),
        Subtract(a2: NamedLambdaVariable, b2: NamedLambdaVariable, _), _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      a1.exprId == a2.exprId && b1.exprId == b2.exprId &&
        Set(a1.exprId, b1.exprId) == Set(p.exprId, q.exprId)
    case _ => false
  }

  /** x -> x * x over the single lambda arg. */
  private def isSquare(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(p: NamedLambdaVariable), _) =>
      a.exprId == p.exprId && b.exprId == p.exprId
    case _ => false
  }

  /** (acc, v) -> acc + v (either order). */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(p.exprId, q.exprId)
    case _ => false
  }

  /** acc -> acc (the identity finish `aggregate` builds without an
    * explicit finish lambda). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(a: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      a.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, prod), Literal(0.0, DoubleType), merge, fin)
          if nonNullDoubleArray(l) && nonNullDoubleArray(r) &&
            isPairProduct(prod) && isSumMerge(merge) && isIdentityFinish(fin) =>
        DotProduct(l, r)
      case ArrayAggregate(ArrayTransform(a, sq), Literal(0.0, DoubleType), merge, fin)
          if nonNullDoubleArray(a) &&
            isSquare(sq) && isSumMerge(merge) && isIdentityFinish(fin) =>
        L2NormSq(a)
      case ArrayAggregate(ZipWith(l, r, dsq), Literal(0.0, DoubleType), merge, fin)
          if nonNullDoubleArray(l) && nonNullDoubleArray(r) &&
            isPairDiffSquare(dsq) && isSumMerge(merge) && isIdentityFinish(fin) =>
        L2DistSq(l, r)
    }
}
