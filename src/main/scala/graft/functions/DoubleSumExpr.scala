package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native strict left-to-right sum of an `array<double>` — the
  * [[DoubleDot]] family's plain-sum member (round 13 optimization
  * pass). Rewritten into automatically by
  * [[graft.plans.RewriteDotProduct]] from the declarative
  * `aggregate(xs, 0.0, _+_)` form, which the per-document probability
  * folds (`ta_bpe_score`, `ta_lm_score`, `pipe_mixture` scoring) use
  * over position-ordered collected arrays. Identical strict IEEE
  * fold; identical null contract (null array → null, null element
  * poisons, empty → 0.0).
  */
case class DoubleSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_dsum needs array<double>, got ${t.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      s += x.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $s += $x.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleSum = copy(child = newChild)

  override def prettyName: String = "graft_dsum"
}

object DoubleSum {
  /** Column surface (no session registration needed). */
  def dsum(a: Column): Column =
    ColumnBridge.column(DoubleSum(ColumnBridge.expression(a)))
}
