package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded max-heap of the k first rows under an arbitrary SortOrder —
  * the generalization of [[TopKBuffer]] from its fixed (double, long,
  * int) slots to any (payload, order keys) row shape, built for
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

/** Aggregate keeping, per group, the k rows that order FIRST; returns
  * array<struct<payload...>> in rank order. Constructed only by
  * [[graft.plans.TopKRewrite]].
  *
  * Row layout (the code-review finding on round-11's first cut, which
  * stored every ORDER BY key twice): `children` is the payload columns
  * followed by only those order expressions that are NOT already a
  * payload column; each sort key addresses its slot through
  * `orderIdx`, so `ORDER BY cos DESC, rid` over payload (rid, cos)
  * adds ZERO extra slots — heap rows, serialized partial buffers, and
  * the exchange payload carry each value once. Grouping columns don't
  * ride the rows at all (the rewrite re-derives them from the
  * Aggregate's grouping output).
  *
  * Row storage is an UnsafeProjection copy per kept row (rejected rows
  * copy nothing); merge streams one buffer into the other; ser/de is
  * length-prefixed UnsafeRow bytes.
  */
case class RowTopK(
    children: Seq[Expression],
    payloadCount: Int,
    orderIdx: Seq[Int],
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    payloadNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, "k must be positive")
  require(payloadCount > 0 && payloadCount <= children.length &&
    payloadNames.length == payloadCount,
    "RowTopK needs >=1 payload column with matching names")
  require(orderIdx.nonEmpty &&
    orderIdx.forall(i => i >= 0 && i < children.length) &&
    ascending.length == orderIdx.length &&
    nullsFirst.length == orderIdx.length,
    "RowTopK needs >=1 in-range order slot with one direction/null-" +
      "ordering each")

  override def prettyName: String = "row_topk"

  private def payload: Seq[Expression] = children.take(payloadCount)

  override def dataType: DataType = ArrayType(
    StructType(payload.zip(payloadNames).map { case (e, n) =>
      StructField(n, e.dataType, e.nullable)
    }), containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sortOrders = orderIdx.indices.map { i =>
      val slot = orderIdx(i)
      SortOrder(
        BoundReference(slot, children(slot).dataType,
          children(slot).nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast,
        Seq.empty)
    }
    // codegen'd comparator (the SortExec path) — every heap probe runs
    // one compare, so the interpreted SortOrder walk is the hot cost;
    // fall back to interpretation if codegen is unavailable
    try org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateOrdering.generate(sortOrders)
    catch {
      case scala.util.control.NonFatal(_) =>
        new InterpretedOrdering(sortOrders)
    }
  }

  @transient private lazy val proj = UnsafeProjection.create(children)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, ordering)

  override def update(b: TopKRowsBuffer, input: InternalRow)
      : TopKRowsBuffer = {
    // probe with the projection's reused row; copy only on keep — most
    // rows lose the root compare and allocate nothing
    val r = proj(input)
    if (b.size < b.k) b.insert(r.copy())
    else {
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
    val types = payload.map(_.dataType)
    val out = b.sortedRows.map { r =>
      val vals = new Array[Any](payloadCount)
      var i = 0
      while (i < payloadCount) {
        vals(i) = r.get(i, types(i))
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
