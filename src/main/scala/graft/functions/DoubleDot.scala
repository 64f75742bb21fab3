package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The pure-`functions._` formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is semantically right
  * but higher-order functions are interpreted — each pair evaluation
  * allocates a zipped array and runs two boxed lambdas per element.
  * On the quadratic similarity joins (`dd_embed_cosine`,
  * `ss_cosine_topk`) that interpretation cost dominated the whole
  * benchmark (~23 µs/pair measured at sf0.1). This expression
  * generates a primitive `double` loop via `doGenCode` — the
  * "custom Catalyst Expression beats UDF beats interpreted" extension
  * tier (SURVEY.md §2.8) — while computing the identical strict
  * left-to-right IEEE fold, so DuckDB-oracle results are unchanged
  * bit-for-bit.
  *
  * Null contract — observationally identical to the HOF form: a null
  * array yields null (BinaryExpression default); arrays of unequal
  * length yield null (`zip_with` null-pads, poisoning the fold); any
  * null *element* yields null (`x * null` is null, and the `+` fold
  * keeps it null). This exactness is what lets
  * [[graft.plans.RewriteDotProduct]] fire on nullable-element arrays
  * without changing results.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_ddot needs two array<double>, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ddot"
}

/** Native squared-L2 distance over two `array<double>` columns —
  * [[DoubleDot]]'s twin for the PQ trainer/encoder hot loop
  * (round 13): the HOF form `aggregate(zip_with(a, b, (x,y) ⇒
  * (x−y)·(x−y)), 0d, _+_)` is interpreted (~23 µs/row — the
  * DoubleDot measurement), and the codebook round evaluates it on
  * the subvector × codebook-entry stream, which made each cb Lloyd
  * round tens of seconds at octave scale. Identical strict
  * left-to-right IEEE fold, identical null contract (null array /
  * length mismatch / null element → null).
  */
case class DoubleSubDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dsubdist needs two array<double>, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleSubDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dsubdist"
}

/** Column-API surface for the native vector expressions — no session
  * registration required, so any SparkSession can run these plans.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Strict left-to-right dot product of two array<double> columns. */
  def ddot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DoubleDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the same fold (bit-compatible with the oracles). */
  def l2norm(a: Column): Column = sqrt(ddot(a, a))

  /** Strict left-to-right squared-L2 distance (Σ(x−y)², the
    * [[DoubleSubDist]] codegen'd fold).
    */
  def dsubdist(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleSubDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
