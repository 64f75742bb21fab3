package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{DoubleDot, DoubleSum, LongDot, MinhashSig, Simhash60}

/** Catalyst optimizer rule: rewrite the declarative higher-order
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, p) -> acc + p)
  *
  * into the native codegen'd [[graft.functions.DoubleDot]]. The HOF
  * form is the natural way to *write* a dot product in the DataFrame
  * API, but higher-order functions are interpreted (boxed lambda per
  * element); the native expression computes the identical strict
  * left-to-right IEEE fold ~20× faster. Users keep the declarative
  * spelling; the optimizer picks the physical form — the Catalyst way
  * of "explicit API first, rule makes it fast" (SURVEY.md §4.1).
  *
  * The match is deliberately conservative: both inputs must be
  * array<double>, the zero literal exactly 0.0d, the zip lambda a
  * pure multiply of its two variables, the merge lambda a pure add of
  * its two variables, and the finish lambda the identity — anything
  * else is left untouched. Matching nullable-element arrays is safe
  * because [[DoubleDot]] reproduces the HOF null contract exactly:
  * null on unequal lengths (zip_with null-pads) and on any null
  * element (the `+` fold poisons), verified by RewriteDotProductSpec.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVarPair(l: Expression, r: Expression,
      vars: Seq[NamedLambdaVariable]): Boolean = (l, r) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      vars.map(_.exprId).toSet == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(m: Multiply, zipVars, _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(s: Add, aggVars, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finVar), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          isVarPair(m.left, m.right,
            zipVars.collect { case v: NamedLambdaVariable => v }) &&
          isVarPair(s.left, s.right,
            aggVars.collect { case v: NamedLambdaVariable => v }) &&
          fin.exprId == finVar.asInstanceOf[NamedLambdaVariable].exprId =>
        DoubleDot(a, b)
      // The integer twin (round 13): the exact-integer embedding dot
      // `aggregate(zip_with(a, b, _*_), 0L, _+_)` — the RAG rerank /
      // recall-truth hot loop — becomes the codegen'd [[LongDot]].
      // Same conservativeness, same null contract (verified in
      // RewriteDotProductSpec); the sum is exact integers, so the
      // fold order could not matter even if it differed.
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(m: Multiply, zipVars, _)),
          Literal(0L, LongType),
          LambdaFunction(s: Add, aggVars, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finVar), _))
        if isLongArray(a) && isLongArray(b) &&
          isVarPair(m.left, m.right,
            zipVars.collect { case v: NamedLambdaVariable => v }) &&
          isVarPair(s.left, s.right,
            aggVars.collect { case v: NamedLambdaVariable => v }) &&
          fin.exprId == finVar.asInstanceOf[NamedLambdaVariable].exprId =>
        LongDot(a, b)
      // Plain strict sum (round 13): `aggregate(xs, 0.0, _+_)` — the
      // per-document probability folds over position-ordered
      // collected arrays — becomes the codegen'd [[DoubleSum]].
      // Identical strict left-to-right IEEE fold, identical null
      // contract.
      case ArrayAggregate(
          xs,
          Literal(0.0d, DoubleType),
          LambdaFunction(s: Add, aggVars, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finVar), _))
        if isDoubleArray(xs) &&
          isVarPair(s.left, s.right,
            aggVars.collect { case v: NamedLambdaVariable => v }) &&
          fin.exprId == finVar.asInstanceOf[NamedLambdaVariable].exprId =>
        DoubleSum(xs)
    }
}

/** Session extensions: the optimizer rule above plus SQL registration
  * of the native expressions, so `spark.sql("... graft_ddot(a, b)")`
  * works alongside the Column API
  * ([[graft.functions.VectorFunctions]] et al., which bind directly
  * and need no registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectFunction((FunctionIdentifier("graft_ddot"),
      info("graft_ddot", "graft_ddot(a, b) - strict dot product of two array<double>"),
      (args: Seq[Expression]) => DoubleDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_ldot"),
      info("graft_ldot", "graft_ldot(a, b) - exact dot product of two array<bigint>"),
      (args: Seq[Expression]) => LongDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(hs) - 60-bit simhash of array<bigint>"),
      (args: Seq[Expression]) => Simhash60(args.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - minhash signature"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, _) => MinhashSig(args.head, k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash k must be an int literal, got $other")
      }))
  }
}
