package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native K-permutation MinHash signature over an `array<bigint>` of
  * shingle hashes — integer-identical to
  * [[TextHash.minhashSignature]] (the higher-order-function reference
  * implementation) and the DuckDB oracle: permutation i is
  * `h_i(x) = ((37 + 101·i)·x + 17 + 131·i) mod Prime`, empty input
  * yields the all-Prime sentinel signature.
  *
  * The HOF form costs K × |shingles| interpreted lambda evaluations
  * per row; this is the same double loop in generated Java.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs array<bigint>, got ${t.sql}")
  }

  private val P = TextHash.Prime

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val ca = 37L + 101L * j
      val cb = 17L + 131L * j
      var min = P
      var i = 0
      while (i < n) {
        val h = (ca * arr.getLong(i) + cb) % P
        if (h < min) min = h
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      val mn = ctx.freshName("mn")
      val h = ctx.freshName("h")
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $ca = 37L + 101L * $j;
         |  long $cb = 17L + 131L * $j;
         |  long $mn = ${P}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = ($ca * $x.getLong($i) + $cb) % ${P}L;
         |    if ($h < $mn) $mn = $h;
         |  }
         |  $out[$j] = $mn;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSig = copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinhashSig {
  /** Column surface (no session registration needed). */
  def minhashNative(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(shingles), k))
}
