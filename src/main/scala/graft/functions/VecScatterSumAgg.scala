package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SCATTER-ADD into a fixed-dimension BIGINT vector:
  * `vecscatter_agg(d, w) GROUP BY chunk` — buf[d] += w — the
  * feature-hashing embed reduction ([[graft.sim.RagRetrieve.embed]]).
  *
  * Before this aggregate the embed was TWO shuffles per corpus pass:
  * token → groupBy(chunk, d) partial sums, then groupBy(chunk) +
  * collect_list + map_from_entries + a dense re-expansion. The
  * scatter-add is associative/commutative over exact integers, so one
  * [[TypedImperativeAggregate]] with a primitive `long[dim]` buffer
  * does it in ONE hash pass: map-side partial aggregation folds every
  * token of a chunk into one dense buffer, a single (key, dim-long
  * buffer) row per (chunk × task) crosses the shuffle, and the dense
  * vector needs no reassembly. This stage's shuffle was what
  * exceeded the round-12 disk ceiling on the 640× rung-16 attempt
  * (BASELINE round-12 note) — the buffer form shrinks it by ~the
  * tokens-per-chunk factor and removes the second shuffle entirely.
  *
  * Exactness: identical values by associativity of long addition —
  * dims never touched stay 0 exactly as the old dense re-expansion's
  * `coalesce(…, 0)`. Out-of-range d or null inputs fail LOUDLY (the
  * [[VecSumAgg]] round-13 discipline).
  */
case class VecScatterSumAgg(
    d: Expression,
    w: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(d, w)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val dv = d.eval(input)
    val wv = w.eval(input)
    require(dv != null && wv != null,
      s"graft_vecscatter_agg: null input (dim=$dim)")
    val di = dv.asInstanceOf[Int]
    require(di >= 0 && di < dim,
      s"graft_vecscatter_agg: index $di out of [0, $dim)")
    buf(di) += wv.asInstanceOf[Long]
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

  override def withNewMutableAggBufferOffset(o: Int): VecScatterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecScatterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecScatterSumAgg =
    copy(d = newChildren(0), w = newChildren(1))

  override def prettyName: String = "graft_vecscatter_agg"
}

object VecScatterSumAgg {
  /** Dense `array<bigint>` of length `dim` with `w` summed into
    * position `d` per input row.
    */
  def vecScatterAgg(d: Column, w: Column, dim: Int): Column =
    ColumnBridge.column(VecScatterSumAgg(
      ColumnBridge.expression(d.cast("int")),
      ColumnBridge.expression(w.cast("long")), dim)
      .toAggregateExpression())
}
