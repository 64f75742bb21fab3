package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane sign sketch over an `array<double>`
  * vector: projects onto `planes` (a bands·bits × dim ±1 matrix),
  * takes the sign bit of each projection, and packs each band's
  * `bits` consecutive sign bits into one integer band key
  * (big-endian: first plane of the band is the high bit).
  *
  * Semantically identical to the composed-Column formulation
  * (`when(ddot(v, plane_p) >= 0, …)` × NPlanes summed into band
  * keys) and to the DuckDB oracle's per-plane
  * `list_sum(list_prepend(0.0, …))` fold — every projection is the
  * same strict left-to-right IEEE fold, so the sign, and therefore
  * every key, is bit-identical (equivalence spec in
  * NativeExprEquivalenceSpec).
  *
  * Why native: 64 separate `DoubleDot` expressions generate ~64
  * unrolled codegen loops; janino compilation of that source costs
  * seconds PER ACTION and recurs on every join branch (measured 3×
  * the whole query at sf0.1). This is one small loop over a
  * referenced constant matrix.
  *
  * Null contract: null array → null; any null element → null; length
  * ≠ dim → null (the [[DoubleDot]] contract). The fixture has none
  * of these.
  */
case class SignSketch(child: Expression, planes: Array[Array[Double]],
    bits: Int) extends UnaryExpression {

  require(bits > 0 && planes.nonEmpty && planes.length % bits == 0,
    s"planes.length (${planes.length}) must be a positive multiple of " +
      s"bits ($bits) — a partial band would index past the key array")

  private val dim = planes.head.length
  private val bands = planes.length / bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_sketch needs array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val keys = new Array[Long](bands)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var s = 0.0
      i = 0
      while (i < dim) { s += v.getDouble(i) * pl(i); i += 1 }
      if (s >= 0)
        keys(p / bits) += 1L << (bits - 1 - p % bits)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val gad = classOf[GenericArrayData].getName
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pl = ctx.freshName("pl")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $dim && !$anyNull; $i++)
         |    $anyNull = $x.isNullAt($i);
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |
         |    long[] $keys = new long[$bands];
         |    for (int $p = 0; $p < ${planes.length}; $p++) {
         |      double[] $pl = $mat[$p];
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++)
         |        $s += $x.getDouble($i) * $pl[$i];
         |      if ($s >= 0)
         |        $keys[$p / $bits] += 1L << ($bits - 1 - $p % $bits);
         |    }
         |    ${ev.value} = new $gad($keys);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignSketch = copy(child = newChild)

  override def prettyName: String = "graft_sign_sketch"
}

object SignSketch {
  /** Column surface (no session registration needed). */
  def signSketch(v: Column, planes: Array[Array[Double]], bits: Int): Column =
    ColumnBridge.column(
      SignSketch(ColumnBridge.expression(v), planes, bits))
}
