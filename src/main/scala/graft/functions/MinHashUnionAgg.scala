package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Aggregate MinHash union: element-wise unsigned-min of per-row
  * signatures within a group.
  *
  * Mathematical basis (standard MinHash property): for signatures
  * sig(A) and sig(B) built with the same permutations,
  * elementwise-min(sig(A), sig(B)) == sig(A ∪ B) exactly. So grouping
  * documents by source and folding their signatures with this aggregate
  * yields the signature of the source's entire shingle set — corpus-level
  * near-duplicate/overlap estimation between whole sources for the cost
  * of one aggregation, no text re-scan.
  *
  * Buffer is a primitive Array[Long]; partial aggregation (map-side
  * combine) works like any built-in aggregate, so the shuffle carries
  * one k-long signature per (partition, group).
  */
case class MinHashUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(-1L) // unsigned max

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == k,
        s"minhash_union(k=$k) got a signature of length ${arr.numElements()}")
      // An all-zero signature is the empty-set convention
      // (MinHashSignature on empty text). The union identity for an
      // empty set is "no contribution" — folding its zeros in would be
      // absorbing (0 is the unsigned minimum) and would poison the
      // whole group's signature.
      var allZero = true
      var i = 0
      while (i < k && allZero) { if (arr.getLong(i) != 0L) allZero = false; i += 1 }
      if (!allZero) {
        i = 0
        while (i < k) {
          val x = arr.getLong(i)
          if (java.lang.Long.compareUnsigned(x, buf(i)) < 0) buf(i) = x
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (java.lang.Long.compareUnsigned(b(i), a(i)) < 0) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    // group with no non-empty signatures: emit the all-zero empty-set
    // convention (note: two empty groups therefore estimate jaccard 1.0
    // against each other — the empty-vs-empty case is definitionally
    // ambiguous and callers should filter empty corpora if it matters)
    if (buf.forall(_ == -1L)) new GenericArrayData(new Array[Long](k))
    else new GenericArrayData(buf.clone())
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = c.head)
  override def prettyName: String = "minhash_union"
}

object MinHashUnionAgg {
  /** Column API: `groupBy(...).agg(minhashUnion(col("signature"), 128))`. */
  def minhashUnion(c: Column, k: Int = 128): Column =
    ExpressionUtils.column(
      MinHashUnionAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Estimated Jaccard between two aggregated signatures: matching
    * positions / k. The position-match count is a one-pass codegen
    * expression ([[graft.functions.SigMatchCount]]) — the
    * `aggregate(zip_with(...))` HOF chain it replaces evaluated two
    * interpreted lambdas per signature position per pair, the dominant
    * per-pair cost of the estimate-verify stage. Identical values: the
    * count is the same integer, the division the same double. */
  def estimatedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    ExpressionUtils.column(graft.functions.SigMatchCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
      .cast("double") / size(a)
  }
}
