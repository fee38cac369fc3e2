package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for fused vector math over
  * array<double> columns — the codegen-friendly replacement for
  * composed zip_with/aggregate trees (SURVEY.md §7.3 "optional
  * Expression for fused distance"). One loop, no intermediate arrays,
  * participates in whole-stage codegen.
  *
  * Accumulation is sequential per accumulator, matching both the
  * declarative zip_with/aggregate form and DuckDB's list functions, so
  * oracle hashes are unchanged.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Mismatched lengths / null elements yield NULL (not a silent read
    * past UnsafeArrayData bounds, which is unchecked in generated code). */
  override def nullable: Boolean = true

  protected def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments")
  }
}

/** cosine(a, b) = dot / (sqrt(||a||²) · sqrt(||b||²)), one fused loop. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // element null-check emitted only when the schema says elements
      // can be null, so the dense-vector hot path stays branch-free
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            double $xi = $x.getDouble($i);
            double $yi = $y.getDouble($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance, one fused loop (sqrt omitted — monotone). */
case class L2Squared(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            double $d = $x.getDouble($i) - $y.getDouble($i);
            $s += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmax_cosine(e, cents): the centroid id whose vector has the
  * highest cosine with `e`, lowest id on exact ties. `cents` is the
  * collapsed one-row quantizer — array<struct<cid: long, ce:
  * array<double>>> sorted ascending by cid — so visiting in array
  * order with strict `>` reproduces the declarative fold's tie policy
  * bit-for-bit (Dedup.argmaxCosineDeclarative, kept as the
  * equivalence-test twin). One fused nested loop in generated code;
  * the interpreted ArrayAggregate fold this replaces paid per-element
  * lambda dispatch on every (vector × centroid) — the semantic-dedup
  * assignment hot path (n·k evals flat, n·2√k two-level).
  *
  * A centroid whose vector is NULL, length-mismatched, or has null
  * elements is SKIPPED (the fold's null-propagating `>` did the same);
  * an empty or all-skipped quantizer yields cid -1 (the fold's init),
  * never null — assignment must stay total or the downstream
  * cluster-join silently drops rows.
  */
case class CosineArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cosine_argmax"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(s: StructType, _)) if s.length == 2 =>
        s(0).dataType == LongType &&
          (s(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<struct<bigint, array<double>>>)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = e.numElements()
    var best = -2.0
    var bestCid = -1L
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val st = cents.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val ce = st.getArray(1)
          if (ce.numElements() == dim) {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            var skip = false
            while (i < dim && !skip) {
              if (e.isNullAt(i) || ce.isNullAt(i)) skip = true
              else {
                val xi = e.getDouble(i); val yi = ce.getDouble(i)
                dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
              }
            }
            if (!skip) {
              val cc = dot / (math.sqrt(na) * math.sqrt(nb))
              if (cc > best) { best = cc; bestCid = st.getLong(0) }
            }
          }
        }
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cents) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val ce = ctx.freshName("ce")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val cc = ctx.freshName("cc")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val skip = ctx.freshName("skip")
      s"""
        int $dim = $e.numElements();
        double $best = -2.0;
        long $bestCid = -1L;
        int $k = $cents.numElements();
        for (int $c = 0; $c < $k; $c++) {
          if ($cents.isNullAt($c)) continue;
          InternalRow $st = $cents.getStruct($c, 2);
          if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
          ArrayData $ce = $st.getArray(1);
          if ($ce.numElements() != $dim) continue;
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          boolean $skip = false;
          for (int $i = 0; $i < $dim; $i++) {
            if ($e.isNullAt($i) || $ce.isNullAt($i)) { $skip = true; break; }
            double $xi = $e.getDouble($i);
            double $yi = $ce.getDouble($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if ($skip) continue;
          double $cc = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          if ($cc > $best) { $best = $cc; $bestCid = $st.getLong(0); }
        }
        ${ev.value} = $bestCid;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_argmin(e, cents): the centroid id at minimum squared-L2 from `e`,
  * lowest id on exact ties (cents sorted ascending by cid, strict `<`).
  * The map-side replacement for the crossJoin + per-key row_number
  * window IVF assignment: the window form materializes and SHUFFLES
  * n·k scored rows to sort each key's k candidates; this visits the
  * one-row broadcast quantizer in a fused loop and emits one row per
  * input. Same skip semantics as [[CosineArgmax]]; empty/all-skipped
  * quantizer → -1.
  */
case class L2Argmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "l2_argmin"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    CosineArgmax(left, right).checkInputDataTypes() match {
      case org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<struct<bigint, array<double>>>)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = e.numElements()
    var best = Double.PositiveInfinity
    var bestCid = -1L
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val st = cents.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val ce = st.getArray(1)
          if (ce.numElements() == dim) {
            var s = 0.0; var i = 0
            var skip = false
            while (i < dim && !skip) {
              if (e.isNullAt(i) || ce.isNullAt(i)) skip = true
              else { val d = e.getDouble(i) - ce.getDouble(i); s += d * d; i += 1 }
            }
            if (!skip && s < best) { best = s; bestCid = st.getLong(0) }
          }
        }
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cents) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val ce = ctx.freshName("ce")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val skip = ctx.freshName("skip")
      s"""
        int $dim = $e.numElements();
        double $best = Double.POSITIVE_INFINITY;
        long $bestCid = -1L;
        int $k = $cents.numElements();
        for (int $c = 0; $c < $k; $c++) {
          if ($cents.isNullAt($c)) continue;
          InternalRow $st = $cents.getStruct($c, 2);
          if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
          ArrayData $ce = $st.getArray(1);
          if ($ce.numElements() != $dim) continue;
          double $s = 0.0;
          boolean $skip = false;
          for (int $i = 0; $i < $dim; $i++) {
            if ($e.isNullAt($i) || $ce.isNullAt($i)) { $skip = true; break; }
            double $d = $e.getDouble($i) - $ce.getDouble($i);
            $s += $d * $d;
          }
          if ($skip) continue;
          if ($s < $best) { $best = $s; $bestCid = $st.getLong(0); }
        }
        ${ev.value} = $bestCid;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_argmin_topk(e, cents, p): the p centroid ids nearest to `e` by
  * squared L2, ordered (distance asc, cid asc) — the probe side of IVF
  * as one map-side expression (explode the result) instead of a
  * crossJoin + row_number ≤ p window over n·k scored rows. The
  * insertion order is exactly the window's (dist, cid) lexicographic
  * rank, so results are engine-portable for the oracle. Returns fewer
  * than p ids only when fewer than p centroids qualify.
  */
case class L2ArgminTopK(left: Expression, right: Expression, p: Int)
    extends BinaryExpression {

  require(p >= 1 && p <= 1024, s"l2_argmin_topk probe count $p out of [1,1024]")

  override def prettyName: String = "l2_argmin_topk"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    L2Argmin(left, right).checkInputDataTypes()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = e.numElements()
    val dists = Array.fill(p)(Double.PositiveInfinity)
    val cids = new Array[Long](p)
    var filled = 0
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val st = cents.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val ce = st.getArray(1)
          if (ce.numElements() == dim) {
            var s = 0.0; var i = 0
            var skip = false
            while (i < dim && !skip) {
              if (e.isNullAt(i) || ce.isNullAt(i)) skip = true
              else { val d = e.getDouble(i) - ce.getDouble(i); s += d * d; i += 1 }
            }
            if (!skip) {
              val cid = st.getLong(0)
              // ascending-cid visit order: a tie on distance never
              // displaces an earlier (lower) cid — strict < suffices
              if (filled < p || s < dists(p - 1)) {
                var pos = math.min(filled, p - 1)
                while (pos > 0 && s < dists(pos - 1)) {
                  dists(pos) = dists(pos - 1); cids(pos) = cids(pos - 1)
                  pos -= 1
                }
                dists(pos) = s; cids(pos) = cid
                if (filled < p) filled += 1
              }
            }
          }
        }
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(cids, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cents) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val ce = ctx.freshName("ce")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val dists = ctx.freshName("dists")
      val cids = ctx.freshName("cids")
      val filled = ctx.freshName("filled")
      val pos = ctx.freshName("pos")
      val cid = ctx.freshName("cid")
      val skip = ctx.freshName("skip")
      s"""
        int $dim = $e.numElements();
        double[] $dists = new double[$p];
        long[] $cids = new long[$p];
        java.util.Arrays.fill($dists, Double.POSITIVE_INFINITY);
        int $filled = 0;
        int $k = $cents.numElements();
        for (int $c = 0; $c < $k; $c++) {
          if ($cents.isNullAt($c)) continue;
          InternalRow $st = $cents.getStruct($c, 2);
          if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
          ArrayData $ce = $st.getArray(1);
          if ($ce.numElements() != $dim) continue;
          double $s = 0.0;
          boolean $skip = false;
          for (int $i = 0; $i < $dim; $i++) {
            if ($e.isNullAt($i) || $ce.isNullAt($i)) { $skip = true; break; }
            double $d = $e.getDouble($i) - $ce.getDouble($i);
            $s += $d * $d;
          }
          if ($skip) continue;
          long $cid = $st.getLong(0);
          if ($filled < $p || $s < $dists[$p - 1]) {
            int $pos = java.lang.Math.min($filled, $p - 1);
            while ($pos > 0 && $s < $dists[$pos - 1]) {
              $dists[$pos] = $dists[$pos - 1]; $cids[$pos] = $cids[$pos - 1];
              $pos--;
            }
            $dists[$pos] = $s; $cids[$pos] = $cid;
            if ($filled < $p) $filled++;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($cids, $filled));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** adc_lookup(tbl, codes): Σ_s tbl[s][codes[s]] — the PQ asymmetric-
  * distance scorer over a per-query distance table (array<array
  * <double>>, subspace-major) and a reference's code array. This is
  * the pair-scan hot path of ADC search: one fused loop of m lookups
  * and adds per (query, reference) pair, whole-stage codegen'd — the
  * zip_with+aggregate HOF form it replaced paid interpreted dispatch
  * per subspace per pair (6.5 s → sub-second for the sf0.1 scan).
  * NULL on malformed input (table/codes length mismatch, code out of
  * bounds, null elements) — a wrong-shape code must be loud, not a
  * silently-partial distance.
  */
case class AdcLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "adc_lookup"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.LongType
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
        true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<bigint>)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tbl = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = tbl.numElements()
    if (codes.numElements() != m) return null
    var s = 0
    var acc = 0.0
    while (s < m) {
      if (tbl.isNullAt(s) || codes.isNullAt(s)) return null
      val row = tbl.getArray(s)
      val c = codes.getLong(s)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c.toInt)) return null
      acc += row.getDouble(c.toInt)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tbl, codes) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
        int $m = $tbl.numElements();
        if ($codes.numElements() != $m) { ${ev.isNull} = true; }
        else {
          double $acc = 0.0;
          for (int $s = 0; $s < $m; $s++) {
            if ($tbl.isNullAt($s) || $codes.isNullAt($s)) {
              ${ev.isNull} = true; break;
            }
            ArrayData $row = $tbl.getArray($s);
            long $c = $codes.getLong($s);
            // NB: no generated line may START with '|' — the codegen
            // pipeline treats a leading pipe as a margin and strips it
            // (observed: a continuation "|| x" lost its operator and
            // the whole stage fell back to interpreted eval)
            if ($c < 0 || $c >= $row.numElements() ||
                $row.isNullAt((int) $c)) {
              ${ev.isNull} = true; break;
            }
            $acc += $row.getDouble((int) $c);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** jl_project(xs, p): signed random projection of a d-vector to p
  * dims — y_j = Σ_i s(j,i)·xs_i with s(j,i) ∈ {−1,+1} from a fixed
  * integer hash, the Johnson–Lindenstrauss / Achlioptas-sign dimension
  * reduction that turns a 100 TB exact-distance scan into a p/d-cost
  * candidate scan. The sign generator is deliberately engine-portable
  * integer arithmetic (two squaring rounds mod the Mersenne prime
  * 2³¹−1 — every intermediate < 2⁶³, so DuckDB's checked BIGINT
  * multiply replays it verbatim; a splitmix-style mixer like
  * [[graft.ext.Similarity]]'s plane generator needs wrapping 64-bit
  * multiplies the oracle engine refuses). Sign quality was measured
  * against i.i.d. gaussian planes before adoption: recall@10 parity
  * on the uniform-sphere worst case (0.40 vs 0.41 at p=16, C=50 —
  * a LINEAR mod-prime parity formula tried first collapsed to 0.22,
  * stripes across adjacent dims). On integer-scaled inputs every
  * projection is exact integer arithmetic in doubles (|y_j| ≤
  * d·2000 ≪ 2⁵³), so ranks replay bit-for-bit in the oracle.
  * NULL on null elements; one fused loop, whole-stage codegen'd.
  */
case class JlProject(child: Expression, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "jl_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if p > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, p > 0)")
    }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](p)
    var j = 0
    while (j < p) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (xs.isNullAt(i)) return null
        val h0 = (i.toLong * 2654435761L + j.toLong * 40503L + 9973L) % 2147483647L
        val h1 = (h0 * h0 + i + j) % 2147483647L
        val h2 = (h1 * h1 + h0) % 2147483647L
        val s = if ((h2 & 1L) == 0L) 1.0 else -1.0
        acc += s * xs.getDouble(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val h0 = ctx.freshName("h0")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      s"""
        int $n = $xs.numElements();
        double[] $out = new double[$p];
        for (int $j = 0; $j < $p && !${ev.isNull}; $j++) {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($xs.isNullAt($i)) { ${ev.isNull} = true; break; }
            long $h0 = (((long) $i) * 2654435761L + ((long) $j) * 40503L
              + 9973L) % 2147483647L;
            long $h1 = ($h0 * $h0 + $i + $j) % 2147483647L;
            long $h2 = ($h1 * $h1 + $h0) % 2147483647L;
            $acc += ((($h2 & 1L) == 0L) ? 1.0 : -1.0) * $xs.getDouble($i);
          }
          $out[$j] = $acc;
        }
        if (!${ev.isNull}) {
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Expose as Columns (classic API bridge to Catalyst expressions). */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def l2Sq(a: Column, b: Column): Column =
    column(L2Squared(expression(a), expression(b)))
  def cosineArgmax(e: Column, cents: Column): Column =
    column(CosineArgmax(expression(e), expression(cents)))
  def l2Argmin(e: Column, cents: Column): Column =
    column(L2Argmin(expression(e), expression(cents)))
  def l2ArgminTopK(e: Column, cents: Column, p: Int): Column =
    column(L2ArgminTopK(expression(e), expression(cents), p))
  def adcLookup(tbl: Column, codes: Column): Column =
    column(AdcLookup(expression(tbl), expression(codes)))
  def jlProject(xs: Column, p: Int): Column =
    column(JlProject(expression(xs), p))
}
