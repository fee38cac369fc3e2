package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch: a d×w grid of counters answering "how often did
  * key u occur?" with one-sided error — the estimate
  * `min_i grid[i][h_i(u)]` NEVER undercounts and overcounts by at most
  * ε·N (ε = e/w) with probability ≥ 1 − (1/2)^d (Cormode & Muthu 2005,
  * the mergeable-summaries frequency workhorse next to Misra–Gries's
  * [[MGBuffer]]: MG answers "which keys are frequent", CM answers "how
  * frequent is THIS key" for any key, without tracking keys at all).
  *
  * The buffer is a fixed `d·w` Long array — no per-key state — so the
  * partial-aggregation shuffle is O(d·w) per partition regardless of
  * how many distinct keys the 100 TB stream carries, and merge is
  * element-wise addition (counters are exact sums over hash cells, so
  * any merge tree yields the same grid).
  *
  * Hashing is the engine-portable 2-universal family over the prime
  * p = 2³¹−1: `h_i(u) = ((a_i·(u mod p) + b_i) mod p) mod w` with the
  * row constants in [[CountMinSketch.RowA]]/[[RowB]]. Every step stays
  * below 2⁶² in a Long, so a DuckDB oracle replays the whole grid —
  * and therefore every estimate — bit-for-bit in BIGINT arithmetic
  * (no engine hash function is ever involved).
  *
  * Null keys count toward `total` but land in no cell (estimates are
  * per-key; a caller that wants nulls tracked coalesces first).
  */
final class CMBuffer(val d: Int, val w: Int) {
  val grid: Array[Long] = new Array[Long](d * w)
  var total: Long = 0L

  def add(u: Long): Unit = {
    total += 1L
    var i = 0
    while (i < d) {
      grid(i * w + CountMinSketch.bucket(u, i, w)) += 1L
      i += 1
    }
  }
}

object CountMinSketch {
  /** 2-universal family modulus (Mersenne prime 2³¹−1): keeps every
    * product `a·(u mod p)` under 2⁶² — exact in Long AND in DuckDB
    * BIGINT, which is what makes the grid oracle-replayable. */
  val P: Long = 2147483647L
  /** Fixed per-row multipliers/offsets (odd constants < P, chosen once;
    * the family needs them nonzero and fixed, not secret). Depth is
    * capped at their length. */
  val RowA: Array[Long] = Array(1361L, 98765431L, 217645199L, 1073741789L,
    413158511L, 687194767L)
  val RowB: Array[Long] = Array(7919L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L)

  def bucket(u: Long, row: Int, w: Int): Int = {
    val um = ((u % P) + P) % P
    (((RowA(row) * um + RowB(row)) % P) % w).toInt
  }
}

/** Aggregate producing `struct<total: bigint, grid: array<bigint>>` —
  * the exact input count and the row-major d×w counter grid. Estimates
  * are then plain Catalyst arithmetic over the (broadcast) grid:
  * `least(element_at(grid, i·w + h_i(u) + 1) …)` — see
  * `ops/Sketches.freqCountMin` for the full declarative read path.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMBuffer] with UnaryLike[Expression] {

  require(d > 0 && d <= CountMinSketch.RowA.length,
    s"depth must be in [1, ${CountMinSketch.RowA.length}]")
  require(w > 0, "width must be positive")

  override def prettyName: String = "count_min"

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("grid", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint argument, got ${child.dataType}")

  override def createAggregationBuffer(): CMBuffer = new CMBuffer(d, w)

  override def update(b: CMBuffer, input: InternalRow): CMBuffer = {
    val v = child.eval(input)
    if (v == null) b.total += 1L
    else b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CMBuffer, other: CMBuffer): CMBuffer = {
    b.total += other.total
    var i = 0
    while (i < b.grid.length) {
      b.grid(i) += other.grid(i)
      i += 1
    }
    b
  }

  override def eval(b: CMBuffer): Any =
    new GenericInternalRow(Array[Any](b.total, new GenericArrayData(b.grid)))

  override def serialize(b: CMBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.d)
    out.writeInt(b.w)
    out.writeLong(b.total)
    b.grid.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CMBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CMBuffer(in.readInt(), in.readInt())
    b.total = in.readLong()
    var i = 0
    while (i < b.grid.length) {
      b.grid(i) = in.readLong()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMin {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** agg column: struct(total, grid) Count-Min summary over `key`. */
  def countMin(key: Column, d: Int, w: Int): Column =
    column(CountMinAgg(expression(key), d, w).toAggregateExpression())
}
