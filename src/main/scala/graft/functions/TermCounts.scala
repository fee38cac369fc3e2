package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** term_counts(array<string>) → array<struct<term:string, tf:long>>:
  * per-row term-frequency runs, term-sorted (binary UTF8 order) for
  * determinism. Empty-string and null elements are skipped (the
  * whitespace tokenizer emits an empty leading token on some inputs).
  *
  * This is the shuffle-elimination primitive for postings builds: when
  * the document id is unique per row — true of the `documents` table
  * and of any corpus keyed by doc — the (doc, term, tf) postings list
  * is a PER-ROW computation, not a groupBy. A 100 TB corpus tokenizes
  * to ~10¹² (doc, term) pairs; folding the count inside the row turns
  * that from the pipeline's largest shuffle into a narrow map stage.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "term_counts"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>")
    }

  override def nullSafeEval(a: Any): Any =
    TermCounts.countStatic(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // loop + hash map live in compiled Scala (static forwarder) so the
      // operator stays inside the whole-stage span without handing Janino
      // a TreeMap state machine
      s"""
        ${ev.value} = graft.functions.TermCounts.countStatic($a);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Static entry for codegen: fold one token array into term-sorted
    * (term, tf) runs. UTF8String's natural order IS binary order, so
    * the TreeMap yields a deterministic layout with no extra sort. */
  def countStatic(tokens: ArrayData): ArrayData = {
    if (tokens == null) return null
    // java.lang.Long values: get() must return null (not a 0-unboxed
    // scala.Long) for the clone-on-first-sight branch below
    val counts = new java.util.TreeMap[UTF8String, java.lang.Long]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          val cur = counts.get(t)
          // clone only on first sight: the input UTF8String may point
          // into a reused scan buffer and map KEYS outlive the element
          // read — but an increment retains no reference (Map.put on
          // an existing key keeps the stored key object), and natural-
          // language token streams are mostly repeats
          if (cur == null) counts.put(t.clone(), 1L): Unit
          else counts.put(t, cur + 1L): Unit
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  def termCounts(tokens: Column): Column =
    column(TermCounts(expression(tokens)))
}
