package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded max-heap of the k smallest (score, id) entries with an int
  * payload per entry. The root is the WORST kept entry, so an incoming
  * row either replaces the root in O(log k) or is rejected in O(1).
  * Ordering is lexicographic (score asc, id asc) — identical to the
  * `Window.orderBy(score, id) + row_number <= k` form it replaces.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val labels = new Array[Int](k)
  var size = 0

  /** true if (s1, i1) orders after (s2, i2) — i.e. is worse. Total
    * order via Double.compare so NaN sorts greater than every finite
    * score (matching Spark SQL's ordering; a primitive > here would
    * make NaN incomparable and wedge it in the heap). -0.0 is
    * normalized to 0.0 on insert, so compare's -0.0 < 0.0 distinction
    * never fires. */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
    val l = labels(a); labels(a) = labels(b); labels(b) = l
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  def insert(rawScore: Double, id: Long, label: Int): Unit = {
    val score = if (rawScore == 0.0) 0.0 else rawScore // normalize -0.0
    if (size < k) {
      scores(size) = score; ids(size) = id; labels(size) = label
      size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; labels(0) = label
      siftDown()
    }
  }

  /** Entry indices sorted ascending by (score, id) (same total order
    * as [[worse]]). */
  def sortedIndices: Array[Int] =
    Array.range(0, size).sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))
}

/** Aggregate keeping the k smallest (score, id, label) entries per
  * group, returned as array<struct<score,id,label>> sorted ascending —
  * the bounded-heap replacement for the crossJoin + window full-sort
  * top-k (SURVEY.md §7.3): partial aggregation keeps at most k entries
  * per group per input partition, so the shuffle after a top-k over
  * |Q|×|R| scored pairs carries O(|Q|·k·partitions) rows instead of
  * |Q|×|R|. Bit-equality with the window form is asserted in
  * VectorExprSpec. For largest-k, negate the score.
  *
  * Null handling: rows with a null score or id are skipped (they have
  * no place in the total order). The label is a non-null-typed payload
  * slot — a null label is coerced to 0 and the row still kept, which
  * diverges from a window form over a nullable label column (that would
  * carry the null through). Engine callers pass non-nullable labels
  * (`lit(0)` or a data column with no nulls); pass a pre-coalesced
  * label if 0 is a meaningful value in your domain.
  */
case class TopKSmallest(
    first: Expression, second: Expression, third: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_smallest"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("label", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == LongType &&
      third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint, int) arguments, got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = first.eval(input)
    val i = second.eval(input)
    if (s != null && i != null) {
      val l = third.eval(input)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (l == null) 0 else l.asInstanceOf[Int])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      b.insert(other.scores(i), other.ids(i), other.labels(i))
      i += 1
    }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val idx = b.sortedIndices
    new GenericArrayData(idx.map(i => new GenericInternalRow(
      Array[Any](b.scores(i), b.ids(i), b.labels(i))): Any))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.scores(i)); out.writeLong(b.ids(i))
      out.writeInt(b.labels(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      b.insert(in.readDouble(), in.readLong(), in.readInt())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** agg column: k smallest (score, id) with payload label, sorted. */
  def smallestK(score: Column, id: Column, label: Column, k: Int): Column =
    column(TopKSmallest(expression(score), expression(id),
      expression(label), k).toAggregateExpression())
}
