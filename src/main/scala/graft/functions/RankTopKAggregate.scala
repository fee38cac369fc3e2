package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Tie-keeping sibling of [[TopKRowsBuffer]] for the `rank()` /
  * `dense_rank()` bounds of [[graft.plans.TopKRewrite]] (round-11
  * verdict punch #1). A `rank() <= k` filter keeps every row with
  * fewer than k rows strictly ordered before it — ALL rows order-equal
  * to the k-th must survive, so a fixed-size heap (which keeps an
  * arbitrary k-subset) is wrong; a `dense_rank() <= k` filter keeps
  * every row among the k smallest DISTINCT sort keys.
  *
  * Structure: a TreeMap from sort key (represented by the first row
  * inserted with it — the comparator looks only at the order slots) to
  * the rows sharing it. Insert is O(log d) in retained distinct keys;
  * a row ordering after the current boundary is rejected in O(log d)
  * without copying. Retention bound: for `rank`, k-1 rows plus the
  * boundary tie group (every retained group has < k rows strictly
  * before it); for `dense_rank`, k distinct keys. Both equal the
  * operator's OUTPUT for the group — the same retention any engine's
  * rank-limit needs — and strictly less than the full-group sort the
  * unrewritten Window plan pays.
  */
final class RankRowsBuffer(val k: Int, val dense: Boolean,
    ord: Ordering[InternalRow]) {

  val groups = new java.util.TreeMap[InternalRow,
    scala.collection.mutable.ArrayBuffer[InternalRow]](
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(a, b)
    })
  var totalRows = 0

  /** Could a row with this sort key still make the bound? Rows at or
    * inside the current boundary always can (inserting them may evict
    * the boundary group — trim handles that); a row strictly AFTER
    * every retained key has exactly `totalRows` rows before it (rank)
    * or would open distinct key `groups.size + 1` (dense_rank). */
  def admits(row: InternalRow): Boolean =
    groups.isEmpty || ord.compare(row, groups.lastKey()) <= 0 ||
      (if (dense) groups.size < k else totalRows < k)

  /** Insert an already-copied row (the caller owns the copy). */
  def insert(row: InternalRow): Unit =
    if (admits(row)) {
      val g = groups.get(row)
      if (g != null) g += row
      else {
        val buf = new scala.collection.mutable.ArrayBuffer[InternalRow](4)
        buf += row
        groups.put(row, buf)
      }
      totalRows += 1
      // only the boundary group can have fallen out of the bound
      if (dense) {
        while (groups.size > k)
          totalRows -= groups.pollLastEntry().getValue.size
      } else {
        while (!groups.isEmpty &&
            totalRows - groups.lastEntry().getValue.size >= k)
          totalRows -= groups.pollLastEntry().getValue.size
      }
    }

  /** (row, rank) in sort order — rank has gaps after ties for `rank`,
    * none for `dense_rank`, exactly the SQL functions' contracts. */
  def ranked: Array[(InternalRow, Int)] = {
    val out = new Array[(InternalRow, Int)](totalRows)
    var i = 0
    var cum = 0
    var key = 0
    val it = groups.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val r = if (dense) key + 1 else cum + 1
      e.getValue.foreach { row => out(i) = (row, r); i += 1 }
      cum += e.getValue.size
      key += 1
    }
    out
  }

  def allRows: Iterator[InternalRow] = {
    val it = new java.util.ArrayList[InternalRow](totalRows)
    groups.values().forEach(g => g.foreach(r => it.add(r): Unit))
    scala.jdk.CollectionConverters.ListHasAsScala(it).asScala.iterator
  }
}

/** Aggregate keeping, per group, every row whose `rank()` (gaps after
  * ties; `dense = false`) or `dense_rank()` (`dense = true`) under the
  * sort order is <= k; returns `array<struct<payload..., __rank int>>`
  * in rank order — the rank VALUE rides the row because tie ranks are
  * not positional (unlike [[RowTopK]]'s pos+1). Constructed only by
  * [[graft.plans.TopKRewrite]]; row layout, slot addressing, partial
  * aggregation and ser/de follow [[RowTopK]] exactly.
  */
case class RankTopK(
    children: Seq[Expression],
    payloadCount: Int,
    orderIdx: Seq[Int],
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    dense: Boolean,
    payloadNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankRowsBuffer] {

  require(k > 0, "k must be positive")
  require(payloadCount > 0 && payloadCount <= children.length &&
    payloadNames.length == payloadCount,
    "RankTopK needs >=1 payload column with matching names")
  require(orderIdx.nonEmpty &&
    orderIdx.forall(i => i >= 0 && i < children.length) &&
    ascending.length == orderIdx.length &&
    nullsFirst.length == orderIdx.length,
    "RankTopK needs >=1 in-range order slot with one direction/null-" +
      "ordering each")

  override def prettyName: String =
    if (dense) "dense_rank_topk" else "rank_topk"

  private def payload: Seq[Expression] = children.take(payloadCount)

  override def dataType: DataType = ArrayType(
    StructType(payload.zip(payloadNames).map { case (e, n) =>
      StructField(n, e.dataType, e.nullable)
    } :+ StructField("__graft_rank", IntegerType, nullable = false)),
    containsNull = false)

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
    // codegen'd comparator like RowTopK — every TreeMap probe runs
    // O(log d) compares; fall back to interpretation if codegen fails
    try org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateOrdering.generate(sortOrders)
    catch {
      case scala.util.control.NonFatal(_) =>
        new InterpretedOrdering(sortOrders)
    }
  }

  @transient private lazy val proj = UnsafeProjection.create(children)

  override def createAggregationBuffer(): RankRowsBuffer =
    new RankRowsBuffer(k, dense, ordering)

  override def update(b: RankRowsBuffer, input: InternalRow)
      : RankRowsBuffer = {
    // probe with the projection's reused row; copy only on admit —
    // past the boundary most rows are rejected with zero allocation
    val r = proj(input)
    if (b.admits(r)) b.insert(r.copy())
    b
  }

  override def merge(b: RankRowsBuffer, other: RankRowsBuffer)
      : RankRowsBuffer = {
    other.allRows.foreach(b.insert)
    b
  }

  override def eval(b: RankRowsBuffer): Any = {
    val types = payload.map(_.dataType)
    val out = b.ranked.map { case (r, rank) =>
      val vals = new Array[Any](payloadCount + 1)
      var i = 0
      while (i < payloadCount) {
        vals(i) = r.get(i, types(i))
        i += 1
      }
      vals(payloadCount) = rank
      new GenericInternalRow(vals): Any
    }
    new GenericArrayData(out)
  }

  override def serialize(b: RankRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.totalRows)
    b.allRows.foreach { r =>
      val bytes = r.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RankRowsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new RankRowsBuffer(in.readInt(), dense, ordering)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): RankTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
