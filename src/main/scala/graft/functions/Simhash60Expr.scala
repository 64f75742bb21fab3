package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash over an `array<bigint>` of token hashes —
  * integer-identical to [[TextHash.simhash60]] (the higher-order
  * function reference implementation, kept for the equivalence spec)
  * and to the DuckDB oracle.
  *
  * The HOF form folds 60 bits × n tokens through interpreted lambdas
  * (~4 ms/row measured at sf0.1, and it runs once per self-join side);
  * this expression is the same double loop in generated Java —
  * microseconds per row. Bit b of the result is 1 iff more tokens
  * have bit b set than clear (term-frequency-weighted majority),
  * folded MSB-first from bit 59.
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 needs array<bigint>, got ${t.sql}")
  }

  private def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var r = 0L
    var b = 59
    while (b >= 0) {
      var ones = 0L
      var i = 0
      while (i < n) { ones += (arr.getLong(i) >> b) & 1L; i += 1 }
      r = r * 2 + (if (2 * ones > n) 1L else 0L)
      b -= 1
    }
    r
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val ones = ctx.freshName("ones")
      s"""
         |int $n = $x.numElements();
         |long $r = 0L;
         |for (int $b = 59; $b >= 0; $b--) {
         |  long $ones = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $ones += ($x.getLong($i) >> $b) & 1L;
         |  }
         |  $r = $r * 2 + ((2 * $ones > $n) ? 1L : 0L);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash60"
}

object Simhash60 {
  /** Column surface (no session registration needed). */
  def simhash60Native(hs60: Column): Column =
    ColumnBridge.column(Simhash60(ColumnBridge.expression(hs60)))
}
