package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ asymmetric-distance (ADC) table lookup sum — the
  * codegen'd twin of the `aggregate(sequence(0, PqM−1), 0.0,
  * (acc, m) -> acc + dt[m·PqCodes + codes[m]])` higher-order fold
  * (round 13 optimization pass).
  *
  * The fold is evaluated once per (query, candidate) pair in EVERY
  * IVFADC search path — `ss_pq_topk`, `ss_ivfpq_topk`,
  * `ss_ivfpq_incr`, `ss_rag_index`, the versioned-index reads and the
  * streaming-ingest search — and the HOF form pays PqM interpreted
  * steps with boxed `element_at` calls per candidate. This is one
  * primitive loop: Σ_m dt[m·pqCodes + codes[m]], folded left-to-right
  * in ascending m — the identical IEEE addition order, so estimates
  * are bit-identical (NativeExprEquivalenceSpec).
  *
  * Null contract — identical to the HOF on its analyzed domain: a
  * null `dt` or `codes` array, or a null element of either, poisons
  * the fold → null. An out-of-range lookup (codes shorter than the
  * fold, an index past the table) is unreachable by construction —
  * codes come from the same codebook geometry that sized the dense
  * table — and fails loudly here.
  */
case class AdcEst(dt: Expression, codes: Expression, pqM: Int,
    pqCodes: Int) extends BinaryExpression {

  require(pqM > 0 && pqCodes > 0)

  override def left: Expression = dt
  override def right: Expression = codes

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (dt.dataType, codes.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_adc_est needs (array<double>, array<int>), got " +
          s"${dt.dataType.sql} / ${codes.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val t = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    if (c.numElements() < pqM) throw new IllegalArgumentException(
      s"graft_adc_est: ${c.numElements()} codes < pqM $pqM")
    var s = 0.0
    var m = 0
    while (m < pqM) {
      if (c.isNullAt(m)) return null
      val idx = m * pqCodes + c.getInt(m)
      if (idx < 0 || idx >= t.numElements())
        throw new IllegalArgumentException(
          s"graft_adc_est: lookup $idx outside the ${t.numElements()}" +
            "-entry distance table")
      if (t.isNullAt(idx)) return null
      s += t.getDouble(idx)
      m += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |if ($c.numElements() < $pqM)
         |  throw new IllegalArgumentException(
         |    "graft_adc_est: " + $c.numElements() + " codes < pqM $pqM");
         |double $s = 0.0;
         |for (int $m = 0; $m < $pqM; $m++) {
         |  if ($c.isNullAt($m)) { ${ev.isNull} = true; break; }
         |  int $idx = $m * $pqCodes + $c.getInt($m);
         |  if ($idx < 0 || $idx >= $t.numElements())
         |    throw new IllegalArgumentException(
         |      "graft_adc_est: lookup " + $idx + " outside the " +
         |        $t.numElements() + "-entry distance table");
         |  if ($t.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |  $s += $t.getDouble($idx);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcEst =
    copy(dt = newLeft, codes = newRight)

  override def prettyName: String = "graft_adc_est"
}

object AdcEst {
  /** Column surface (no session registration needed). */
  def adcEst(dt: Column, codes: Column, pqM: Int, pqCodes: Int): Column =
    ColumnBridge.column(AdcEst(ColumnBridge.expression(dt),
      ColumnBridge.expression(codes), pqM, pqCodes))
}
