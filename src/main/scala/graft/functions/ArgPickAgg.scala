package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** ARGMAX/ARGMIN as a TRUE hash aggregation (round 13, the
  * `ss_rag_index` cold-octave fix): pick the id whose (score, id)
  * pair is extreme — max score with ties to the SMALLEST id (argmax),
  * or min score with ties to the smallest id (argmin).
  *
  * Why this exists: the round-12 trainers selected with
  * `max(struct(cc, −cid))` — identical semantics, but a declarative
  * Max over a STRUCT buffer is not HashAggregate-compatible (struct
  * buffers are not mutable UnsafeRow fields), so Catalyst planned
  * every Lloyd assignment and every encode pass as SortAggregate:
  * partial AND final SORTS of the full vector × centroid score
  * stream. Linear in rows but sort-spill-bound — measured as the
  * 2.51×/octave cold crossing at 64×→128× (BASELINE round-12 octave
  * note). A TypedImperativeAggregate with a 3-long primitive buffer
  * plans as ObjectHashAggregate — with the session's raised
  * sort-fallback threshold (see [[graft.GraftSession]]) a pure hash
  * pass: no sort anywhere, partial aggregation on the map side, one
  * pre-reduced row per (key × task) across the shuffle at any scale.
  *
  * Exactness: comparisons are primitive-double (score) and long
  * (id) — the same total order the struct Max used on this data
  * (cosines/distances are never NaN here, enforced loudly; −0.0 vs
  * 0.0 compares equal in BOTH orderings, ties then break on id —
  * identical selection). Differential-verified across the sim tier.
  */
case class ArgPickAgg(
    score: Expression,
    id: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  // buf = [has (0/1), doubleToLongBits(score), id]
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  private def better(s: Double, i: Long, bs: Double, bi: Long): Boolean =
    (if (isMax) s > bs else s < bs) || (s == bs && i < bi)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      val s = sv.asInstanceOf[Double]
      require(!s.isNaN, "graft_argpick: NaN score (undefined ordering)")
      val i = iv.asInstanceOf[Long]
      if (buf(0) == 0L ||
          better(s, i, java.lang.Double.longBitsToDouble(buf(1)), buf(2))) {
        buf(0) = 1L
        buf(1) = java.lang.Double.doubleToLongBits(s)
        buf(2) = i
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2(0) == 1L && (b1(0) == 0L ||
        better(java.lang.Double.longBitsToDouble(b2(1)), b2(2),
          java.lang.Double.longBitsToDouble(b1(1)), b1(2)))) {
      b1(0) = 1L; b1(1) = b2(1); b1(2) = b2(2)
    }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(0) == 0L) null else buf(2)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(24)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(3)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgPickAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgPickAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgPickAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String =
    if (isMax) "graft_argmax_id" else "graft_argmin_id"
}

object ArgPickAgg {
  /** Id (LONG) of the row with the MAXIMUM score; exact-score ties
    * break to the smallest id — the `max(struct(score, −id))`
    * selection as a hash aggregation.
    */
  def argMaxId(score: Column, id: Column): Column =
    ColumnBridge.column(ArgPickAgg(
      ColumnBridge.expression(score.cast("double")),
      ColumnBridge.expression(id.cast("long")), isMax = true)
      .toAggregateExpression())

  /** Id (LONG) of the row with the MINIMUM score; ties to the
    * smallest id — the `min(struct(score, id))` selection.
    */
  def argMinId(score: Column, id: Column): Column =
    ColumnBridge.column(ArgPickAgg(
      ColumnBridge.expression(score.cast("double")),
      ColumnBridge.expression(id.cast("long")), isMax = false)
      .toAggregateExpression())
}
