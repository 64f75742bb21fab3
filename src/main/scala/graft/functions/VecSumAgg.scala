package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise SUM of fixed-dimension BIGINT vectors:
  * `vecsum_agg(qv) GROUP BY cid` — the centroid-update reduction of
  * the Lloyd's trainers ([[graft.sim.VectorSearch]]).
  *
  * Before this aggregate the update step was posexplode →
  * groupBy(key, idx) → groupBy(key) + collect_list + sort_array: TWO
  * shuffles per round carrying dim rows per vector, re-assembled by a
  * sort. The element-wise long sum is associative and commutative, so
  * a [[TypedImperativeAggregate]] with a primitive `long[dim]` buffer
  * plans with PARTIAL aggregation: each map task folds its vectors
  * into one buffer per key and only (key, dim-long buffer) rows cross
  * ONE shuffle — at 100 TB that is n_keys × dim longs, never the
  * exploded (key, idx, value) stream. Exactness is unchanged: the
  * inputs are the same once-quantized exact integers, and long
  * addition is associative in any order.
  */
case class VecSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim)

  override def update(buf: Array[Long], input: org.apache.spark.sql
      .catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      // Loud-failure discipline (ADVICE r12): a silent min() here would
      // zero-pad short vectors / truncate long ones and skew Lloyd
      // centroid sums without any error — a wrong `dim` argument or
      // ragged input must fail the job, not corrupt the trainer.
      require(a.numElements() == dim,
        s"graft_vecsum_agg: input vector has ${a.numElements()} " +
          s"elements, expected dim=$dim")
      var i = 0
      while (i < dim) {
        require(!a.isNullAt(i),
          s"graft_vecsum_agg: null element at index $i (dim=$dim)")
        buf(i) += a.getLong(i); i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vecsum_agg"
}

object VecSumAgg {
  /** Column surface: element-wise sum of a `array<bigint>` column of
    * fixed dimension `dim`.
    */
  def vecSumAgg(v: Column, dim: Int): Column =
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(v), dim)
        .toAggregateExpression())
}
