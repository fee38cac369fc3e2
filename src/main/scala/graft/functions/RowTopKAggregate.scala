package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded max-heap of the k first rows under an arbitrary SortOrder —
  * the generalization of [[TopKBuffer]] from its fixed (double, long,
  * int) slots to any (order keys, payload) row shape, built for
  * [[graft.plans.TopKRewrite]]: a `row_number() <= k` window filter is
  * rewritten into this aggregate, so the rewrite must carry whatever
  * columns the user's window child produced, under whatever ORDER BY
  * the user wrote. The root is the WORST kept row: an incoming row
  * either replaces the root in O(log k) or is rejected in O(1), and
  * partial (map-side) aggregation keeps ≤ k rows per group per input
  * partition — the shuffle after a top-k over |Q|×|R| scored pairs
  * carries O(groups·k·partitions) rows instead of |Q|×|R|.
  */
final class TopKRowsBuffer(val k: Int, ord: Ordering[InternalRow]) {
  val rows = new Array[InternalRow](k)
  var size = 0

  private def worse(a: InternalRow, b: InternalRow): Boolean =
    ord.compare(a, b) > 0

  private def swap(a: Int, b: Int): Unit = {
    val t = rows(a); rows(a) = rows(b); rows(b) = t
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(rows(i), rows(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(rows(l), rows(m))) m = l
      if (r < size && worse(rows(r), rows(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  /** Insert an already-copied row (the caller owns the copy). Ties at
    * the boundary keep the incumbent — among order-equal rows the kept
    * subset is arbitrary, exactly the row_number() tie contract. */
  def insert(row: InternalRow): Unit =
    if (size < k) {
      rows(size) = row
      size += 1
      siftUp(size - 1)
    } else if (worse(rows(0), row)) {
      rows(0) = row
      siftDown()
    }

  /** Rows in rank order (ascending by the sort order). */
  def sortedRows: Array[InternalRow] = {
    val out = new Array[InternalRow](size)
    System.arraycopy(rows, 0, out, 0, size)
    java.util.Arrays.sort(out, 0, size, ord)
    out
  }
}

/** Aggregate keeping, per group, the k rows that order FIRST under the
  * given directions/null-orderings over the first `nOrder` children;
  * returns array<struct<payload...>> in rank order (payload = the
  * remaining children, named `payloadNames`). Constructed only by
  * [[graft.plans.TopKRewrite]] — which derives the children from the
  * window's ORDER BY and the window child's full output — so input
  * types are whatever the analyzer already accepted as orderable for
  * the window.
  *
  * Row storage is an UnsafeProjection copy per kept row (rejected rows
  * copy nothing); merge streams one buffer into the other; ser/de is
  * length-prefixed UnsafeRow bytes.
  */
case class RowTopK(
    children: Seq[Expression],
    nOrder: Int,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    payloadNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, "k must be positive")
  require(nOrder > 0 && nOrder < children.length &&
    ascending.length == nOrder && nullsFirst.length == nOrder,
    "RowTopK needs >=1 order key, >=1 payload column, and one " +
      "direction/null-ordering per order key")

  override def prettyName: String = "row_topk"

  private def payload: Seq[Expression] = children.drop(nOrder)

  private def rowSchemaFields: Seq[StructField] =
    children.take(nOrder).zipWithIndex.map { case (e, i) =>
      StructField(s"__o$i", e.dataType, e.nullable)
    } ++ payload.zip(payloadNames).map { case (e, n) =>
      StructField(n, e.dataType, e.nullable)
    }

  override def dataType: DataType = ArrayType(
    StructType(payload.zip(payloadNames).map { case (e, n) =>
      StructField(n, e.dataType, e.nullable)
    }), containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sortOrders = (0 until nOrder).map { i =>
      SortOrder(
        BoundReference(i, children(i).dataType, children(i).nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast,
        Seq.empty)
    }
    new InterpretedOrdering(sortOrders)
  }

  @transient private lazy val proj = UnsafeProjection.create(children)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, ordering)

  override def update(b: TopKRowsBuffer, input: InternalRow)
      : TopKRowsBuffer = {
    // project first, copy only if kept: probe with the reused row, copy
    // on insert — but the heap stores the row, so the probe must
    // already be the copy. k is small and most rows are rejected at the
    // root compare; copying per-insert only would need a two-phase
    // probe. Simplest correct: copy when the row will be kept.
    val r = proj(input)
    if (b.size < b.k) b.insert(r.copy())
    else {
      // root compare without copying: reject in O(1) with zero alloc
      val root = b.rows(0)
      if (ordering.compare(root, r) > 0) b.insert(r.copy())
    }
    b
  }

  override def merge(b: TopKRowsBuffer, other: TopKRowsBuffer)
      : TopKRowsBuffer = {
    var i = 0
    while (i < other.size) {
      b.insert(other.rows(i))
      i += 1
    }
    b
  }

  override def eval(b: TopKRowsBuffer): Any = {
    val fields = rowSchemaFields
    val out = b.sortedRows.map { r =>
      val vals = new Array[Any](payload.length)
      var i = 0
      while (i < payload.length) {
        vals(i) = r.get(nOrder + i, fields(nOrder + i).dataType)
        i += 1
      }
      new GenericInternalRow(vals): Any
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      val u = b.rows(i).asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKRowsBuffer(in.readInt(), ordering)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(children.length)
      row.pointTo(buf, len)
      b.insert(row)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RowTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RowTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
