package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native fixed-point integer log2 with 8 fractional bits — the
  * codegen'd twin of [[graft.text.QualityClassifier.qlog2]]'s
  * generated higher-order-function fold (round 13 optimization pass).
  *
  * The HOF form runs an interpreted 8-step `aggregate(sequence(1, 8),
  * …)` whose every step is a boxed CASE over BIGINT shifts — evaluated
  * four times per vocabulary word in the NB trainers and twice per
  * document in the scorers, which made it a measurable slice of
  * `ta_nb_model`/`ta_nb_quality`/`ta_nb_eval` and of the `pipe_quality`
  * stage every corpus-pipeline store derives from. This expression is
  * the identical integer algorithm as one primitive loop:
  *
  *   bitlen  = length(bin(c)) − 1           (Long.toBinaryString)
  *   m       = c normalized to [2^15, 2^16) (shift by 16 − bitlen − 1)
  *   acc     = m·2^8; 8× { sq = (acc>>8)²;
  *             acc = sq ≥ 2^31 ? (sq>>16)·2^8 + (acc%2^8)·2 + 1
  *                             : (sq>>15)·2^8 + (acc%2^8)·2 }
  *   result  = bitlen·2^8 + acc % 2^8
  *
  * Exactness: pure 64-bit integer shifts/multiplies in the identical
  * order — every intermediate matches the HOF fold bit for bit on ALL
  * long inputs including 0 (bin(0) = "0" → bitlen 0 → qlog2(0) = 0)
  * and negatives (bin = 64-char two's complement, arithmetic shifts —
  * unreachable on the counts domain but replicated anyway), verified
  * on random + edge inputs by NativeExprEquivalenceSpec. Null → null,
  * the UnaryExpression default, same as the HOF.
  */
case class Qlog2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_qlog2 needs bigint, got ${t.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    Qlog2.compute(a.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Qlog2.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Qlog2 = copy(child = newChild)

  override def prettyName: String = "graft_qlog2"
}

object Qlog2 {

  /** The fold, replicating the SQL expression exactly: bin() is
    * Long.toBinaryString (1 char for 0, 64 for negatives), shifts are
    * arithmetic, % is Java remainder.
    */
  def compute(c: Long): Long = {
    val len = java.lang.Long.toBinaryString(c).length
    val m0 = if (len >= 16) c >> (len - 16) else c << (16 - len)
    var acc = m0 * 256L
    var i = 0
    while (i < 8) {
      val m = acc >> 8
      val sq = m * m
      acc =
        if (sq >= 2147483648L) (sq >> 16) * 256L + (acc % 256L) * 2 + 1
        else (sq >> 15) * 256L + (acc % 256L) * 2
      i += 1
    }
    (len - 1L) * 256L + acc % 256L
  }

  /** Column surface over a BIGINT SQL expression — drop-in for the
    * HOF-fold [[graft.text.QualityClassifier.qlog2]].
    */
  def qlog2Native(sqlExpr: String): Column =
    ColumnBridge.column(Qlog2(ColumnBridge.expression(
      org.apache.spark.sql.functions.expr(
        s"CAST(($sqlExpr) AS BIGINT)"))))
}
