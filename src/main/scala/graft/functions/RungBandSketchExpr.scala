package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native rung-windowed sign-projection band sketch over an exact
  * integer embedding (`array<bigint>`) — the
  * [[graft.sim.RagRetrieve.withBands]] hot loop as one codegen'd
  * expression (round 13 optimization pass).
  *
  * Semantics are EXACTLY the composed higher-order form it replaces:
  * for band `b` in 0 until `nBands`, fold bits MSB-first over rungs
  * `r` in 0 until `rung`, where bit(b, r) = 1 iff
  * `Σ_i v[i] · planes[planeIdx(b, r)][i] > 0` (strictly greater), and
  * `planeIdx` is the frozen-stride segment layout: plane
  * `b·seg0 + r` for `r < seg0`, else
  * `nBands·seg0 + b·(maxBits − seg0) + (r − seg0)` — so every band
  * key at every rung is bit-identical to the HOF form and to the
  * DuckDB oracle's plane-table fold (NativeExprEquivalenceSpec).
  *
  * Why native: the HOF form is three nested interpreted lambdas
  * (transform → aggregate → aggregate(zip_with)) allocating a zipped
  * array per (band, rung, element) — nBands × rung × dim boxed steps
  * per chunk, the dominant cost of the banded-frame build in
  * `ss_rag_retrieve`/`ss_rag_recall`. This is one primitive loop over
  * a referenced constant matrix (the [[SignSketch]] precedent, with
  * the rung dynamic because band width is corpus-derived).
  *
  * Null/edge contract — observationally identical to the HOF form on
  * its analyzed domain: a null vector, a null element, or a length ≠
  * dim vector makes every projection NULL, which the
  * `when(proj > 0, 1).otherwise(0)` bit turns into 0 — i.e. all band
  * keys 0 (NOT null); a null rung yields an array of null keys. A
  * rung outside [1, maxBits] is unreachable by construction
  * (corpus-count CASE ladder + the loud ladder guard) and fails
  * loudly here rather than silently diverging.
  */
case class RungBandSketch(vec: Expression, rung: Expression,
    planes: Array[Array[Long]], nBands: Int, seg0: Int, maxBits: Int)
    extends BinaryExpression {

  require(nBands > 0 && seg0 > 0 && maxBits >= seg0 &&
    planes.length == nBands * maxBits,
    s"planes.length (${planes.length}) must equal nBands·maxBits " +
      s"($nBands * $maxBits) under the frozen-stride layout")

  private val dim = planes.head.length

  override def left: Expression = vec
  override def right: Expression = rung

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, rung.dataType) match {
      case (ArrayType(LongType, _), IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_rung_band_sketch needs (array<bigint>, int), got " +
          s"${vec.dataType.sql} / ${rung.dataType.sql}")
    }

  private def planeIdx(b: Int, r: Int): Int =
    if (r < seg0) b * seg0 + r
    else nBands * seg0 + b * (maxBits - seg0) + (r - seg0)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val rv = rung.eval(input)
    if (rv == null)
      return new GenericArrayData(Array.fill[Any](nBands)(null))
    val r = rv match {
      case i: Int => i
      case l: Long => l.toInt
    }
    if (r < 1 || r > maxBits) throw new IllegalArgumentException(
      s"graft_rung_band_sketch rung $r outside [1, $maxBits]")
    val vv = vec.eval(input)
    val keys = new Array[Long](nBands)
    if (vv != null) {
      val v = vv.asInstanceOf[ArrayData]
      if (v.numElements() == dim && !hasNull(v)) {
        val raw = v.toLongArray()
        var b = 0
        while (b < nBands) {
          var key = 0L
          var q = 0
          while (q < r) {
            val pl = planes(planeIdx(b, q))
            var s = 0L
            var i = 0
            while (i < dim) { s += raw(i) * pl(i); i += 1 }
            key = key * 2 + (if (s > 0) 1L else 0L)
            q += 1
          }
          keys(b) = key
          b += 1
        }
      }
    }
    new GenericArrayData(keys)
  }

  private def hasNull(v: ArrayData): Boolean = {
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "long[][]")
    val self = ctx.addReferenceObj("self", this, getClass.getName)
    val vEv = vec.genCode(ctx)
    val rEv = rung.genCode(ctx)
    val gad = classOf[GenericArrayData].getName
    val keys = ctx.freshName("keys")
    val b = ctx.freshName("b")
    val q = ctx.freshName("q")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val key = ctx.freshName("key")
    val pl = ctx.freshName("pl")
    val raw = ctx.freshName("raw")
    val ok = ctx.freshName("ok")
    val r = ctx.freshName("r")
    val rCast = if (rung.dataType == LongType) s"(int) ${rEv.value}"
      else rEv.value
    val code =
      s"""
         |${vEv.code}
         |${rEv.code}
         |ArrayData ${ev.value};
         |if (${rEv.isNull}) {
         |  ${ev.value} = new $gad(new Object[$nBands]);
         |} else {
         |  int $r = $rCast;
         |  if ($r < 1 || $r > $maxBits)
         |    throw new IllegalArgumentException(
         |      "graft_rung_band_sketch rung " + $r +
         |        " outside [1, $maxBits]");
         |  long[] $keys = new long[$nBands];
         |  boolean $ok = !${vEv.isNull} &&
         |    ${vEv.value}.numElements() == $dim;
         |  if ($ok) {
         |    for (int $i = 0; $i < $dim && $ok; $i++)
         |      $ok = !${vEv.value}.isNullAt($i);
         |  }
         |  if ($ok) {
         |    long[] $raw = ${vEv.value}.toLongArray();
         |    for (int $b = 0; $b < $nBands; $b++) {
         |      long $key = 0L;
         |      for (int $q = 0; $q < $r; $q++) {
         |        long[] $pl = $mat[(int) $self.planeIdxPub($b, $q)];
         |        long $s = 0L;
         |        for (int $i = 0; $i < $dim; $i++)
         |          $s += $raw[$i] * $pl[$i];
         |        $key = $key * 2 + ($s > 0 ? 1L : 0L);
         |      }
         |      $keys[$b] = $key;
         |    }
         |  }
         |  ${ev.value} = new $gad($keys);
         |}
       """.stripMargin
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  /** Codegen entry for the frozen-stride plane index (public because
    * the generated class calls it through the reference object).
    */
  def planeIdxPub(b: Int, r: Int): Int = planeIdx(b, r)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RungBandSketch =
    copy(vec = newLeft, rung = newRight)

  override def prettyName: String = "graft_rung_band_sketch"
}

object RungBandSketch {
  /** Column surface (no session registration needed). */
  def rungBandSketch(v: Column, rung: Column,
      planes: Array[Array[Long]], nBands: Int, seg0: Int,
      maxBits: Int): Column =
    ColumnBridge.column(RungBandSketch(
      ColumnBridge.expression(v), ColumnBridge.expression(rung),
      planes, nBands, seg0, maxBits))
}
