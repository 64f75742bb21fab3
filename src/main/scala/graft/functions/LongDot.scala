package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native dot product over two `array<bigint>` columns — the integer
  * twin of [[DoubleDot]] (round 13 optimization pass).
  *
  * The RAG retrieval tier's exact rerank and its brute-force recall
  * truth side both score candidates with the declarative
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold over the exact
  * integer embeddings. Higher-order functions are interpreted — each
  * pair allocates a zipped array and runs two boxed lambdas per
  * element (~23 µs/pair measured on the double twin at sf0.1), and the
  * candidate count is queries × bands × TargetBucket, so the
  * interpretation cost dominated `ss_rag_retrieve`/`ss_rag_recall`
  * (the two most expensive warm rows of BENCH_r12). This expression
  * generates a primitive `long` loop via `doGenCode`.
  *
  * Exactness: integer addition is associative and commutative, but the
  * loop keeps the identical left-to-right order anyway. Overflow is
  * unreachable on the declared domain (|element| ≤ chunk token count,
  * dim = 64 → |dot| < 2^40); the loop still uses
  * `Math.multiplyExact`/`addExact` so an overflow would fail loudly
  * (the ANSI-mode HOF errors there too) instead of silently wrapping.
  *
  * Null contract — observationally identical to the HOF form: a null
  * array yields null (BinaryExpression default); arrays of unequal
  * length yield null (`zip_with` null-pads, poisoning the fold); any
  * null element yields null. Verified by NativeExprEquivalenceSpec and
  * RewriteDotProductSpec.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_ldot needs two array<bigint>, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
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
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s = java.lang.Math.addExact($s,
         |      java.lang.Math.multiplyExact($x.getLong($i), $y.getLong($i)));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ldot"
}

object LongDot {
  /** Column surface (no session registration needed). */
  def ldot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
