package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst vector-distance expressions over `array<float>`.
  *
  * These are the Spark-side analog of the reference's
  * `anndists::Distance<T>` strategy objects (reference lib.rs:7-8,38):
  * L2, cosine, and dot product, each with `doGenCode` so the distance
  * kernel runs inside whole-stage codegen — no UDF boxing, no
  * per-element Scala closure. Elements are widened float→double before
  * accumulating (sequential, left-to-right) so results match the
  * DuckDB oracle's double-precision list kernels.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  /** Java loop body: given array vars `a`, `b`, length `n` and loop
    * index name `i`, assign the result to `result` (a declared double).
    * `i` MUST be the supplied fresh name, never a literal: outside
    * whole-stage codegen (`GenerateUnsafeProjection` et al.) the
    * generated `apply` method's input-row PARAMETER is named `i`
    * (`CodegenContext.INPUT_ROW`), Java forbids a local shadowing an
    * enclosing parameter, and the resulting Janino error silently
    * drops the entire projection to interpreted mode. */
  protected def loopCode(a: String, b: String, n: String, result: String, i: String): String

  protected def evalVectors(x: ArrayData, y: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    evalVectors(a, b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      val i = ctx.freshName("gi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: dimension mismatch");
         |}
         |double $res = 0.0;
         |{
         |  // own scope: loopCode templates use fixed ACCUMULATOR names
         |  // (acc, dot, …); without braces two sibling distance
         |  // expressions in one non-nullable-input codegen stage
         |  // would declare duplicate method-scope locals and Janino
         |  // would reject the stage (silent interpreted fallback).
         |  // The loop INDEX is fresh-named even so — see loopCode.
         |  ${loopCode(a, b, n, res, i)}
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** Euclidean distance: sqrt(Σ (x−y)²). Reference: anndists DistL2. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_l2_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
       |  acc += d * d;
       |}
       |$res = Math.sqrt(acc);
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance: 1 − dot/(‖x‖·‖y‖). Reference: anndists DistCosine. */
case class CosineDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double dot = 0.0, nx = 0.0, ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double xi = (double) $a.getFloat($i);
       |  double yi = (double) $b.getFloat($i);
       |  dot += xi * yi; nx += xi * xi; ny += yi * yi;
       |}
       |$res = (nx == 0.0 || ny == 0.0) ? 1.0 : 1.0 - dot / (Math.sqrt(nx) * Math.sqrt(ny));
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    // zero-norm → 1.0 (consistent with graft.index.Metric.Cosine)
    if (nx == 0.0 || ny == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Manhattan distance: Σ |x−y|. Reference: anndists DistL1 (the
  * reference is generic over any `anndists::Distance<T>`, README
  * "Distance metrics ... et.al."). */
case class L1Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_l1_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  acc += Math.abs((double) $a.getFloat($i) - (double) $b.getFloat($i));
       |}
       |$res = acc;
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      acc += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble); i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Chebyshev distance: max |x−y|. Reference: anndists DistLinf. */
case class LinfDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_linf_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double d = Math.abs((double) $a.getFloat($i) - (double) $b.getFloat($i));
       |  if (d > acc) acc = d;
       |}
       |$res = acc;
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val d = math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble)
      if (d > acc) acc = d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Generalized (weighted) Jaccard distance over non-negative
  * vectors: 1 − Σ min(x,y) / Σ max(x,y). Reference: anndists
  * DistJaccard (the reference is generic over any
  * `anndists::Distance<T>`, lib.rs:7-8; anndists defines Jaccard over
  * unsigned integer weights — this is the same formula widened to
  * float). Both-zero vectors → 0 (identical), never NaN. Callers feed
  * non-negative data (counts, quantized codes, abs of embeddings);
  * negative inputs would make Σ max non-monotone and are the caller's
  * contract to avoid, matching the unsigned domain of the original. */
case class JaccardDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_jaccard_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double smin = 0.0; double smax = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double xi = (double) $a.getFloat($i);
       |  double yi = (double) $b.getFloat($i);
       |  smin += Math.min(xi, yi); smax += Math.max(xi, yi);
       |}
       |$res = (smax == 0.0) ? 0.0 : 1.0 - smin / smax;
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var smin = 0.0; var smax = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      smin += math.min(xi, yi); smax += math.max(xi, yi); i += 1
    }
    if (smax == 0.0) 0.0 else 1.0 - smin / smax
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hellinger distance: √(1 − Σ √(p·q)) over probability
  * distributions. Reference: anndists DistHellinger, which requires
  * inputs already L1-normalized; this form self-normalizes (p_i =
  * |x_i| / Σ|x|) so it agrees exactly with anndists on its own domain
  * (Σ|x| = 1 makes the division a no-op) and extends to raw
  * non-negative weight vectors. The Bhattacharyya sum is clamped to
  * [0,1] before the outer sqrt so float noise can never yield NaN.
  * Both-zero vectors → 0 (no distribution to distinguish). */
case class HellingerDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_hellinger_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double sa = 0.0; double sb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  sa += Math.abs((double) $a.getFloat($i));
       |  sb += Math.abs((double) $b.getFloat($i));
       |}
       |if (sa == 0.0 || sb == 0.0) { $res = (sa == sb) ? 0.0 : 1.0; }
       |else {
       |  double bc = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    bc += Math.sqrt((Math.abs((double) $a.getFloat($i)) / sa)
       |        * (Math.abs((double) $b.getFloat($i)) / sb));
       |  }
       |  $res = Math.sqrt(Math.max(0.0, Math.min(1.0, 1.0 - bc)));
       |}
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var sa = 0.0; var sb = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      sa += math.abs(x.getFloat(i).toDouble)
      sb += math.abs(y.getFloat(i).toDouble); i += 1
    }
    if (sa == 0.0 || sb == 0.0) { if (sa == sb) 0.0 else 1.0 }
    else {
      var bc = 0.0; i = 0
      while (i < n) {
        bc += math.sqrt((math.abs(x.getFloat(i).toDouble) / sa)
          * (math.abs(y.getFloat(i).toDouble) / sb))
        i += 1
      }
      math.sqrt(math.max(0.0, math.min(1.0, 1.0 - bc)))
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jensen-Shannon distance: √(0.5·Σ[p·ln(p/m) + q·ln(q/m)]) with
  * m = (p+q)/2, natural log. Reference: anndists DistJensenShannon,
  * which requires inputs already L1-normalized; this form
  * self-normalizes (p_i = |x_i| / Σ|x|) so it agrees exactly with
  * anndists on its own domain and extends to raw non-negative weight
  * vectors, the same convention as [[HellingerDistance]]. 0·ln 0 = 0
  * by continuity, and m > 0 whenever either term runs, so no division
  * by zero; the divergence is clamped at 0 before the outer sqrt so
  * float noise at identity can never yield NaN. Disjoint supports (and
  * the one-zero-vector case) reach the metric's maximum √(ln 2);
  * both-zero → 0. */
case class JensenShannonDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_js_distance"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double sa = 0.0; double sb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  sa += Math.abs((double) $a.getFloat($i));
       |  sb += Math.abs((double) $b.getFloat($i));
       |}
       |if (sa == 0.0 || sb == 0.0) { $res = (sa == sb) ? 0.0 : Math.sqrt(Math.log(2.0)); }
       |else {
       |  double acc = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    double p = Math.abs((double) $a.getFloat($i)) / sa;
       |    double q = Math.abs((double) $b.getFloat($i)) / sb;
       |    double m = 0.5 * (p + q);
       |    double t = 0.0;
       |    if (p > 0.0) t += p * Math.log(p / m);
       |    if (q > 0.0) t += q * Math.log(q / m);
       |    acc += t;
       |  }
       |  $res = Math.sqrt(Math.max(0.0, 0.5 * acc));
       |}
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var sa = 0.0; var sb = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      sa += math.abs(x.getFloat(i).toDouble)
      sb += math.abs(y.getFloat(i).toDouble); i += 1
    }
    if (sa == 0.0 || sb == 0.0) { if (sa == sb) 0.0 else math.sqrt(math.log(2.0)) }
    else {
      var acc = 0.0; i = 0
      while (i < n) {
        val p = math.abs(x.getFloat(i).toDouble) / sa
        val q = math.abs(y.getFloat(i).toDouble) / sb
        val m = 0.5 * (p + q)
        var t = 0.0
        if (p > 0.0) t += p * math.log(p / m)
        if (q > 0.0) t += q * math.log(q / m)
        acc += t
        i += 1
      }
      math.sqrt(math.max(0.0, 0.5 * acc))
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product: Σ x·y. Reference: anndists DistDot (ranking by −dot). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot_product"

  override protected def loopCode(a: String, b: String, n: String, res: String, i: String): String =
    s"""
       |double dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
       |$res = dot;
     """.stripMargin

  override protected def evalVectors(x: ArrayData, y: ArrayData): Double = {
    var dot = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer squared-L2 over `array<int>` u8 codes: Σ (a−b)² accumulated
  * in a long, returned as double (to match the oracle's
  * `CAST(list_sum(...) AS DOUBLE)`). The distance kernel of the native
  * u8 path (reference is generic over element type, lib.rs:7-8;
  * examples/bigann.rs serves u8) — codegen'd, because the interpreted
  * `aggregate(zip_with(...))` HOF chain it replaces allocated a boxed
  * pair array per candidate and ran ~30× slower (the exact
  * anti-pattern [[LshBucket]]'s docstring warns about). No float
  * participates: results are bit-portable across engines. */
case class IntSqL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_int_sql2_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<int>, array<int>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch $n vs ${b.numElements()}")
    var acc = 0L; var i = 0
    while (i < n) {
      val d = (a.getInt(i) - b.getInt(i)).toLong
      acc += d * d; i += 1
    }
    acc.toDouble
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: dimension mismatch");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long) ($a.getInt($i) - $b.getInt($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = (double) $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Product-quantization asymmetric distance (ADC): given a query's
  * per-subspace lookup table `lut` (array<double>, length m·ksub —
  * lut[s·ksub + j] = squared L2 between the query's subvector s and
  * codebook entry j) and a vector's PQ codes (array<int>, length m),
  * the approximate squared distance is Σ_s lut[s·ksub + codes[s]] —
  * m table lookups instead of a dim-length float loop. This is the
  * in-memory distance DiskANN traverses its graph with (Subramanya et
  * al., NeurIPS'19 §3; full-precision rerank follows). Codegen'd for
  * the same reason as [[IntSqL2Distance]]: the candidate loop is the
  * hot path and an interpreted HOF chain there runs ~30× slower.
  * Summation is s-ascending, matching the oracle's ordered list
  * reduce. */
case class PqAdcDistance(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def prettyName: String = "graft_pq_adc_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double> lut, array<int> codes), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]; val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m * ksub != lut.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: lut length ${lut.numElements()} != m($m) * ksub($ksub)")
    var acc = 0.0; var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(s"$prettyName: code $c outside [0, $ksub)")
      acc += lut.getDouble(s * ksub + c); s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $codes.numElements();
         |if ($m * $ksub != $lut.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: lut/codes shape mismatch");
         |}
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  final int $c = $codes.getInt($s);
         |  if ($c < 0 || $c >= $ksub) {
         |    throw new IllegalArgumentException("$prettyName: code outside codebook");
         |  }
         |  $acc += $lut.getDouble($s * $ksub + $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest-centroid assignment of an `array<float>` vector: the cell
  * id of the closest of a small driver-side centroid table (IVF coarse
  * assignment / a Lloyd iteration's E-step). Distance is
  * sqrt(Σ(x−y)²) with double accumulation — bit-identical to
  * [[graft.index.Metric.L2]], which the mapPartitions kernel this
  * replaces used — and ties keep the lowest cell id (centroids are
  * iterated id-ascending with strict `<`), matching the oracle's
  * `min(struct(dist, cell))` / `row_number() ORDER BY dist, cell`
  * replay. The centroid matrix rides into generated code via
  * `addReferenceObj`, so assignment is a map-only PROJECTION inside
  * whole-stage codegen: no corpus×k join fan-out, no groupBy argmin
  * exchange, and no Dataset-encoder serde boundary — the three shapes
  * this expression exists to avoid. At 100 TB the corpus never
  * shuffles for assignment at all. */
case class NearestCell(child: Expression, cells: Array[Int], cents: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cells.length == cents.length && cells.nonEmpty,
    s"NearestCell: ${cells.length} cell ids vs ${cents.length} centroids")
  require(cents.forall(_.length == cents(0).length),
    "NearestCell: centroids have inconsistent dimensions")
  override def prettyName: String = "graft_nearest_cell"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // explicit dim check like every sibling distance expression: a
    // longer vector would index past the centroid (raw AIOOBE), a
    // shorter one would silently assign by a partial-dim distance
    if (n != cents(0).length)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim $n != centroid dim ${cents(0).length}")
    var best = -1; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0; var i = 0
      while (i < n) { val d = arr.getFloat(i).toDouble - cv(i).toDouble; acc += d * d; i += 1 }
      val dist = math.sqrt(acc)
      if (dist < bestD) { bestD = dist; best = cells(c) }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cv = ctx.addReferenceObj("nearestCents", cents, "float[][]")
      val ids = ctx.addReferenceObj("nearestCells", cells, "int[]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist"); val row = ctx.freshName("row")
      s"""
         |final int $n = $v.numElements();
         |if ($n != $cv[0].length) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_cell: vector dim " + $n + " != centroid dim " + $cv[0].length);
         |}
         |int $best = -1;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cv.length; $c++) {
         |  final float[] $row = $cv[$c];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double d = (double) $v.getFloat($i) - (double) $row[$i];
         |    $acc += d * d;
         |  }
         |  final double $dist = Math.sqrt($acc);
         |  if ($dist < $bestD) { $bestD = $dist; $best = $ids[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket of an `array<float>` vector: bit p of
  * the result is the sign of ⟨v, h_p⟩ for the deterministic LCG-derived
  * hyperplane family h_p[d] = ((1103515245·(p·64+d) + 12345) mod 2³¹)
  * / 2³¹ − 0.5 — bit-identical to the SQL HOF fragment
  * (`VectorQueries.sparkLshBucketN`) and its DuckDB replay, but
  * codegen'd: the interpreted `aggregate(transform(sequence))` chain
  * allocates per element; this is one fused loop over a constant
  * coefficient table. Plane seeds stride by 64, matching the SQL form
  * on the 64-dim corpus (dims beyond 64 are ignored). */
case class LshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // SQL registration lets arbitrary literals reach this constructor:
  // planes > 64 would silently alias onto low bits (1L << p wraps),
  // planes < 1 would crash coefs — fail at construction instead
  require(planes >= 1 && planes <= 64,
    s"graft_lsh_bucket: planes must be in [1, 64], got $planes")
  override def prettyName: String = "graft_lsh_bucket"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  @transient private lazy val coefs: Array[Double] = LshBucket.coefs(planes)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val lim = math.min(arr.numElements(), 64)
    val cs = coefs
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      val base = p * 64
      var d = 0
      while (d < lim) { acc += arr.getFloat(d).toDouble * cs(base + d); d += 1 }
      if (acc > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("lshCoefs", coefs, "double[]")
      val lim = ctx.freshName("lim"); val p = ctx.freshName("p")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $lim = Math.min($v.numElements(), 64);
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  final int base = $p * 64;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    $acc += (double) $v.getFloat($d) * $cs[base + $d];
         |  }
         |  if ($acc > 0.0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBucket {
  /** Hyperplane coefficients, index p·64+d — the LCG recurrence both
    * SQL dialects replay. */
  def coefs(planes: Int): Array[Double] = Array.tabulate(planes * 64) { i =>
    ((1103515245L * i + 12345L) % 2147483648L) / 2147483648.0 - 0.5
  }
}

/** `binary` u8 codes → `array<float>` (unsigned widen, lossless:
  * 0..255 is exact in f32). The lazy per-row widening that lets a
  * native-u8 source (`spark.read.format("bvecs")`,
  * [[graft.sources.BvecsDataSource]]) feed the float graph BUILD
  * without ever materializing a widened column — the scan and any
  * stored/exported form stay one byte per slot (reference
  * examples/bigann.rs serves BigANN u8 end to end). Codegen'd, so the
  * widen fuses into the consuming stage. */
case class U8CodesToFloats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_u8_to_floats"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = (bytes(i) & 0xff).toFloat; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("gi")
      s"""
         |final float[] $out = new float[$c.length];
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $out[$i] = (float) ($c[$i] & 0xff);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points (and SQL registration for `expr(...)` use). */
object VectorExprs {
  private def col2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    bridge.column(f(bridge.expression(a), bridge.expression(b)))

  def l2Dist(a: Column, b: Column): Column = col2(L2Distance)(a, b)
  def l1Dist(a: Column, b: Column): Column = col2(L1Distance)(a, b)
  def linfDist(a: Column, b: Column): Column = col2(LinfDistance)(a, b)
  def cosineDist(a: Column, b: Column): Column = col2(CosineDistance)(a, b)
  def dotProduct(a: Column, b: Column): Column = col2(DotProduct)(a, b)
  def jaccardDist(a: Column, b: Column): Column = col2(JaccardDistance)(a, b)
  def hellingerDist(a: Column, b: Column): Column = col2(HellingerDistance)(a, b)
  def jsDist(a: Column, b: Column): Column = col2(JensenShannonDistance)(a, b)
  def intSqL2Dist(a: Column, b: Column): Column = col2(IntSqL2Distance)(a, b)
  def pqAdcDist(lut: Column, codes: Column, ksub: Int): Column =
    bridge.column(PqAdcDistance(bridge.expression(lut), bridge.expression(codes), ksub))
  def lshBucket(v: Column, planes: Int): Column =
    bridge.column(LshBucket(bridge.expression(v), planes))
  def u8ToFloats(codes: Column): Column =
    bridge.column(U8CodesToFloats(bridge.expression(codes)))
  /** `cents` as (cellId, centroid) pairs; sorted id-ascending here so
    * the tie rule (lowest cell) holds regardless of caller order. */
  def nearestCell(v: Column, cents: Array[(Int, Array[Float])]): Column = {
    val sorted = cents.sortBy(_._1)
    bridge.column(NearestCell(bridge.expression(v), sorted.map(_._1), sorted.map(_._2)))
  }

  /** Register every graft expression as a SQL function (idempotent) —
    * makes the full surface usable from `spark.sql(...)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_l2_distance", es => L2Distance(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine_distance", es => CosineDistance(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l1_distance", es => L1Distance(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_linf_distance", es => LinfDistance(es.head, es(1)), "scala_udf")
    // ONE literal-extraction rule for every int-parameter function —
    // also turns a non-foldable argument into a named error instead
    // of a raw NPE/ClassCastException out of eval(null). toIntExact:
    // a bigint literal like 2^32+k must fail loudly, not silently
    // truncate to k (same contract as GraftFunctions.intLit)
    def litInt(e: Expression): Int =
      try Math.toIntExact(e.eval(null).asInstanceOf[Number].longValue)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"literal argument $e is out of Int range")
        case _: Exception => throw new IllegalArgumentException(
          s"expected a foldable integer literal argument, got $e")
      }
    reg.createOrReplaceTempFunction("graft_int_sql2_distance", es => IntSqL2Distance(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_adc_distance",
      es => PqAdcDistance(es.head, es(1), litInt(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_lsh_bucket",
      es => LshBucket(es.head, litInt(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_roll_hash", es => RollingHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash62", es => SimHash62(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      es => SortedIntersectCount(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_hashes",
      es => TokenHashes(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_shingle_hashes",
      es => WordShingleHashes(es.head, litInt(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_char_ngrams_sorted",
      es => CharNGramsSorted(es.head, litInt(es(1))), "scala_udf")
  }
}
