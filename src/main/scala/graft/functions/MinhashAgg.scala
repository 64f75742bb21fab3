package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash as an AGGREGATE: `minhash_agg(shingle_hash) GROUP BY doc`
  * over row-shaped shingles — the form needed when shingles arrive
  * exploded (one row per shingle: streaming ingest, generator output,
  * or a shuffle-partitioned shingle table) rather than as a per-doc
  * array ([[MinhashSig]] covers the array shape).
  *
  * Same permutation family as [[TextHash.minhashSignature]]:
  * `h_i(x) = ((37 + 101·i)·x + 17 + 131·i) mod Prime`, empty group →
  * all-Prime sentinel.
  *
  * Implemented as a [[TypedImperativeAggregate]] with a primitive
  * `long[K]` buffer. The per-permutation minimum is associative and
  * commutative, so Catalyst plans this with PARTIAL aggregation: each
  * map task folds its shingles into a K-long buffer and only buffers
  * cross the shuffle — at 100 TB the shuffle carries
  * n_docs × K longs, never the shingle stream itself (exactly the
  * combiner the reference runtime lacks, `src/mapreduce.c:292-303`).
  */
case class MinhashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = TextHash.Prime

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(P)

  override def update(buf: Array[Long], input: org.apache.spark.sql
      .catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val h = ((37L + 101L * i) * x + 17L + 131L * i) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinhashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinhashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_minhash_agg"
}

object MinhashAgg {
  /** Column surface: aggregate a BIGINT shingle-hash column into a
    * K-long MinHash signature.
    */
  def minhashAgg(shingleHash: Column, k: Int): Column =
    ColumnBridge.column(
      MinhashAgg(ColumnBridge.expression(shingleHash), k)
        .toAggregateExpression())
}
