package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EqualTo, Expression, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule (the (c)-tier extension point): rewrites the
  * higher-order-function dot-product idioms into the native codegen'd
  * [[LongDot]], so a user who writes the portable SQL form
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *   aggregate(q, 0L, (acc, x) -> acc + x * x)
  *
  * gets the tight generated loop automatically (both HOFs are
  * interpreted CodegenFallback — measured 2-4× per-query on the vector
  * family at sf0.1).
  *
  * Semantics preserved:
  *  - fires only on ARRAY<BIGINT NOT NULL> inputs (a null element would
  *    propagate null through the HOF chain; LongDot has no null slot);
  *  - the two-array form is guarded by `size(a) = size(b)` — zip_with
  *    pads the shorter side with nulls, making the HOF result null on a
  *    length mismatch, so the rewrite yields null there too (and a null
  *    array nulls the guard, taking the same branch);
  *  - deliberate deviation: ANSI mode would raise on int64 overflow
  *    inside the HOF's Multiply/Add, LongDot wraps — irrelevant for
  *    micro-unit quantized vectors (|q| ≤ 1e6, 64 dims ⇒ |dot| ≤ 6.4e13)
  *    and excludable via spark.sql.optimizer.excludedRules.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def vars(args: Seq[Any]): Seq[NamedLambdaVariable] =
    args.collect { case n: NamedLambdaVariable => n }

  private def samePair(x: NamedLambdaVariable, y: NamedLambdaVariable,
      args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 && x.exprId != y.exprId &&
      Set(x.exprId, y.exprId) == args.map(_.exprId).toSet

  private def isIdentity(fn: Expression, args: Seq[NamedLambdaVariable]): Boolean =
    (fn, args) match {
      case (v: NamedLambdaVariable, Seq(a)) => v.exprId == a.exprId
      case _ => false
    }

  /** aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) */
  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), zargs, _)),
            Literal(0L, LongType),
            LambdaFunction(Add(u: NamedLambdaVariable, v: NamedLambdaVariable, _), margs, _),
            LambdaFunction(fin, fargs, _))
          if longArrayNoNulls(a) && longArrayNoNulls(b) &&
            samePair(x, y, vars(zargs)) && samePair(u, v, vars(margs)) &&
            isIdentity(fin, vars(fargs)) =>
        Some((a, b))
      case _ => None
    }
  }

  /** aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
    * (acc, v) -> acc + v) — the squared euclidean distance (the k-means
    * / PQ assignment idiom). (x-y)² = (y-x)², so the unordered pair
    * check is sound here just as for the dot product.
    */
  private object L2Shape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(
                Multiply(
                  Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                  Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
                zargs, _)),
            Literal(0L, LongType),
            LambdaFunction(Add(u: NamedLambdaVariable, v: NamedLambdaVariable, _), margs, _),
            LambdaFunction(fin, fargs, _))
          if longArrayNoNulls(a) && longArrayNoNulls(b) &&
            x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            samePair(x1, y1, vars(zargs)) && samePair(u, v, vars(margs)) &&
            isIdentity(fin, vars(fargs)) =>
        Some((a, b))
      case _ => None
    }
  }

  /** aggregate(q, 0L, (acc, x) -> acc + x * x) — the squared norm */
  private object NormShape {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(q,
            Literal(0L, LongType),
            LambdaFunction(
              Add(acc: NamedLambdaVariable,
                Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _),
              margs, _),
            LambdaFunction(fin, fargs, _))
          if longArrayNoNulls(q) && x1.exprId == x2.exprId && {
            val vs = vars(margs)
            vs.length == 2 && vs.head.exprId == acc.exprId && vs(1).exprId == x1.exprId
          } && isIdentity(fin, vars(fargs)) =>
        Some(q)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // the rewrites DUPLICATE child expressions (a/b into the size guard
    // AND the dot; q into both LongDot slots), so they are only sound
    // when the children are deterministic — a non-deterministic array
    // (e.g. built from rand()) could give the guard and the kernel
    // different values. Deterministic duplicates cost nothing extra in
    // practice (CSE merges them).
    case DotShape(a, b) if a.deterministic && b.deterministic =>
      If(EqualTo(Size(a), Size(b)), LongDot(a, b), Literal(null, LongType))
    case L2Shape(a, b) if a.deterministic && b.deterministic =>
      If(EqualTo(Size(a), Size(b)), LongL2(a, b), Literal(null, LongType))
    case NormShape(q) if q.deterministic => LongDot(q, q)
  }
}
