package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** bpe_encode(word, merges): greedy byte-pair-encoding of one word
  * against a ranked merge table (array<struct<a,b>>, rank = array
  * order) — the tokenizer-application half of BPE (the reference
  * surface's tokenizer-prep tier; training lives in
  * [[graft.ext.Corpus]]). Output is the token sequence joined with
  * single spaces.
  *
  * MERGE SEMANTICS ARE DELIBERATELY STRING-REPLACE-FIXPOINT, not the
  * textbook array scan: per rank, the <SEP>-delimited token string
  * has every `<SEP> a <SEP> b <SEP>` occurrence replaced (one
  * left-to-right non-overlapping literal pass — exactly
  * java.lang.String#replace AND DuckDB/ANSI replace()), repeated until
  * the pass changes nothing. For a run of identical tokens the two
  * formulations pair DIFFERENTLY ([x,x,x,x,x] with merge (x,x): array
  * scan gives [xx,xx,x], a first replace pass gives [xx,x,xx] because
  * the second occurrence's leading delimiter was consumed by the
  * first) — so the fixpoint form is THE defined semantic, shared
  * verbatim by the engine, the trainer's merge step, and the oracle's
  * recursive-CTE replay. Codepoint-level init matches DuckDB's
  * character slicing.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _)) =>
        st.fields.length == 2 && st.fields.forall(_.dataType == StringType)
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<struct<string,string>>)")
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeEncode.encodeStatic(w.asInstanceOf[UTF8String],
      m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) => {
      // the loop lives in compiled Scala (static forwarder), keeping
      // the operator inside the whole-stage span without inlining a
      // string state machine into Janino
      s"""
        ${ev.value} = graft.functions.BpeEncode.encodeStatic($w, $m);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  val Sep = "\u0001"

  /** One replace pass repeated to fixpoint — THE merge semantic (see
    * class doc). Shared by the trainer so train and encode agree. */
  def applyMerge(s: String, a: String, b: String): String = {
    val pat = Sep + a + Sep + b + Sep
    val rep = Sep + a + b + Sep
    var cur = s
    var next = cur.replace(pat, rep)
    while (next != cur) { cur = next; next = cur.replace(pat, rep) }
    cur
  }

  /** Word → <SEP>-delimited codepoint string (leading+trailing sep). */
  def toSepString(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 1)
    sb.append(Sep)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp).append(Sep)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Static entry for codegen: encode one word, return space-joined
    * tokens. Null merge rows / null fields are skipped (a malformed
    * merge table must not silently corrupt the token stream — skipping
    * a null rank is visible in the output length, not a crash). */
  def encodeStatic(word: UTF8String, merges: ArrayData): UTF8String = {
    if (word == null || merges == null) return null
    var s = toSepString(word.toString)
    var r = 0
    val n = merges.numElements()
    while (r < n) {
      if (!merges.isNullAt(r)) {
        val st = merges.getStruct(r, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1))
          s = applyMerge(s, st.getUTF8String(0).toString,
            st.getUTF8String(1).toString)
      }
      r += 1
    }
    val trimmed = s.substring(1, s.length - 1)
    UTF8String.fromString(trimmed.replace(Sep, " "))
  }

  def bpeEncode(word: Column, merges: Column): Column =
    column(BpeEncode(expression(word), expression(merges)))
}
