package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with m counters plus an exact
  * element total.
  *
  * Insert: increment a tracked key, or claim a free counter, or — when
  * all m counters are taken by OTHER keys — decrement every counter and
  * drop zeros (one arrival "cancels" m tracked arrivals; each of the
  * m+1 decremented units was counted once, so the total decrement work
  * is amortized O(1) per arrival).
  *
  * Merge (mergeable-summaries form): sum counters key-wise, then if more
  * than m keys remain, subtract the (m+1)-th largest count from all and
  * drop non-positives. Both steps only ever UNDERCOUNT, by at most
  * total/(m+1) per key in any interleaving of inserts and merges — so
  * every key with true frequency > total/(m+1) still holds a positive
  * counter in the final summary. That is the exactness contract
  * [[graft.ext.Corpus]]'s `heavy_hitters` builds on: MG candidates are a
  * superset of the threshold-frequent keys, and an exact recount of just
  * the candidates filtered back to `freq*(m+1) > total` equals the true
  * threshold-frequent set at ANY data scale.
  */
final class MGBuffer(val m: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var total: Long = 0L

  def add(key: String): Unit = {
    total += 1L
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1L)
      case None if counts.size < m => counts.update(key, 1L)
      case None =>
        // decrement-all; retain only survivors
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1L)
        }
        dead.foreach(counts.remove)
    }
  }

  def addCount(key: String, c: Long): Unit =
    counts.update(key, counts.getOrElse(key, 0L) + c)

  /** Trim back to at most m counters by subtracting the (m+1)-th
    * largest count from every counter (no-op when already within m). */
  def trim(): Unit = {
    if (counts.size > m) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val d = sorted(sorted.length - (m + 1)) // (m+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else counts.update(k, c - d)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** Aggregate producing `struct<total: bigint, cands: array<string>>`:
  * the exact input count and the (sorted) Misra–Gries candidate keys —
  * everything the exact-recount phase of a threshold-frequent query
  * needs from ONE pass. The partial buffers are at most m counters per
  * input partition, so the shuffle this replaces — `groupBy(key)` over
  * a key space too wide to shuffle (distinct URLs / n-grams at 100 TB) —
  * collapses to O(m × partitions) rows into a single reducer.
  *
  * Null keys are counted in `total` but never tracked (they have no
  * place in a frequent-ITEMS summary; a caller that cares filters or
  * coalesces first).
  */
case class MisraGriesSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {

  require(m > 0, "m must be positive")

  override def prettyName: String = "misra_gries"

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("cands", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}")

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v == null) b.total += 1L
    else b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, other: MGBuffer): MGBuffer = {
    b.total += other.total
    other.counts.foreach { case (k, c) => b.addCount(k, c) }
    b.trim()
    b
  }

  override def eval(b: MGBuffer): Any = {
    val cands = b.counts.keys.toArray
    java.util.Arrays.sort(cands, java.util.Comparator.naturalOrder[String]())
    new GenericInternalRow(Array[Any](b.total,
      new GenericArrayData(cands.map(UTF8String.fromString(_): Any))))
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.m)
    out.writeLong(b.total)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MGBuffer(in.readInt())
    b.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readUTF()
      b.addCount(k, in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrequentItems {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** agg column: struct(total, cands) Misra–Gries summary over `key`. */
  def misraGries(key: Column, m: Int): Column =
    column(MisraGriesSketch(expression(key), m).toAggregateExpression())
}
