package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * Spark's `zip_with` + `aggregate` higher-order functions are
  * `CodegenFallback`: every element pays an interpreted lambda application
  * plus an `InternalRow` write/read, and the expression fences whole-stage
  * codegen. On the vector pack that fold IS the workload — a cosine verify
  * of c candidate pairs runs 3·64·c lambda applications. As a native
  * `BinaryExpression` the dot product compiles to one static call that
  * bulk-copies each `UnsafeArrayData` to a primitive `float[]` (a single
  * `Platform.copyMemory`) and runs a tight primitive loop — measured ~10×
  * on the q35 verify stage at bench scale.
  *
  * The accumulation order (left-to-right over the dims, in double) is
  * IDENTICAL to the `aggregate(zip_with(...))` fold it replaces, so every
  * DuckDB oracle that was green against the higher-order form stays green
  * bit-for-bit against this one.
  */
object VecMath {
  /** Σ a(i)·b(i) over min(|a|,|b|) dims, folded left-to-right in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val fa = a.toFloatArray()
    val fb = b.toFloatArray()
    val n = math.min(fa.length, fb.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += fa(i).toDouble * fb(i).toDouble; i += 1 }
    s
  }

  /** Fixed-point scale for the LSH projections (see `VectorOps`): floats are
    * quantized to round(x·2²⁰) longs so every projection is an exact,
    * order-independent integer sum — portable to any SQL engine.
    */
  val ProjScale = 1L << 20

  /** round-half-away-from-zero — the semantics of BOTH Spark's `round()`
    * (BigDecimal HALF_UP) and DuckDB's `ROUND()`. `math.round` would differ
    * on negative ties (it rounds toward +∞), and the classic
    * `floor(v + 0.5)` differs just below a half-tie (0.49999999999999994 +
    * 0.5 rounds UP to 1.0 in FP before floor sees it, while HALF_UP on the
    * exact value yields 0). This form compares the EXACT fractional part
    * instead: `|v| - floor(|v|)` is exact for doubles (Sterbenz — both
    * operands are within a factor of 2 once |v| ≥ 1, trivially exact
    * below), so `frac >= 0.5` is precisely BigDecimal HALF_UP on the
    * double's value, with no FP-addition edge. Bit-parity with Spark
    * `round()` is pinned in VecExprsSpec including the adversarial
    * near-tie values.
    */
  private[graft] def roundHalfAway(v: Double): Long = {
    val a = math.abs(v)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (v >= 0) r else -r).toLong
  }

  /** Banded random-hyperplane LSH signature: one long of `planesPerBand`
    * sign bits per band, `bands` entries. Plane j's integer weights are
    * w(i,j) = ((i·31 + j·17) mod 7) − 3 over the [[ProjScale]]-quantized
    * dims — all-integer, so the bits are bit-identical to the DuckDB oracle
    * regardless of summation order. One native pass per vector replaces a
    * bands·planesPerBand-column codegen'd aggregate whose janino compile
    * alone cost ~10 s of driver time at 128 planes.
    */
  def lshBits(a: ArrayData, bands: Int, planesPerBand: Int): ArrayData = {
    val fa = a.toFloatArray()
    val q = new Array[Long](fa.length)
    var i = 0
    while (i < fa.length) {
      q(i) = roundHalfAway(fa(i).toDouble * ProjScale.toDouble)
      i += 1
    }
    val out = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var bits = 0L
      var k = 0
      while (k < planesPerBand) {
        val j = t * planesPerBand + k
        var s = 0L
        var d = 0
        while (d < q.length) { s += q(d) * (((d * 31 + j * 17) % 7) - 3); d += 1 }
        if (s >= 0) bits |= (1L << k)
        k += 1
      }
      out(t) = bits
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Fixed-point quantization of one `array<float>` vector: element i maps
    * to [[roundHalfAway]]`(xᵢ · scale)` as a long — bit-identical to the
    * `transform(a, x => round(x.cast("double") * scale).cast("long"))`
    * chain it replaces (float→double exact, one IEEE multiply, half-up
    * rounding == Spark `round` == DuckDB `ROUND`), but compiled: the
    * higher-order `transform` is CodegenFallback and paid an interpreted
    * lambda + boxed long per element.
    */
  def quantizeFixed(a: ArrayData, scale: Double): ArrayData = {
    val fa = a.toFloatArray()
    val out = new Array[Long](fa.length)
    var i = 0
    while (i < fa.length) {
      out(i) = roundHalfAway(fa(i).toDouble * scale)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Nearest-centroid assignment of one quantized `array<bigint>` vector
    * against a k×d long centroid matrix: returns the (d², clusterId) pair
    * minimizing integer squared L2, ties to the LOWER cluster id — exactly
    * the `array_min(array(struct(d2, cluster)...))` lexicographic argmin it
    * replaces. The matrix enters the expression as ONE constant operand
    * (a codegen reference object), so plan size and codegen size are FLAT
    * in k: at production IVF list counts (4k–64k centroids) the k-literal
    * plan this supersedes grew k·d struct expressions and collapsed to
    * interpreted evaluation, while this loop costs k·d multiplies inside
    * one compiled method. All-integer, so the argmin is bit-portable to
    * the DuckDB oracle regardless of either engine's evaluation order.
    *
    * `centroids` rows must be sorted by ascending `clusterIds` entry (the
    * Column binding enforces this), making the strict `<` comparison
    * tie-break to the lowest id.
    */
  def argminD2(x: ArrayData, centroids: Array[Array[Long]],
      clusterIds: Array[Int]): org.apache.spark.sql.catalyst.InternalRow = {
    val xs = x.toLongArray()
    var bestD2 = Long.MaxValue
    var bestCl = Int.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val n = math.min(xs.length, cc.length)
      var s = 0L
      var i = 0
      while (i < n) { val d = xs(i) - cc(i); s += d * d; i += 1 }
      if (s < bestD2 || (s == bestD2 && clusterIds(c) < bestCl)) {
        bestD2 = s
        bestCl = clusterIds(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD2, bestCl))
  }

  /** Double-precision variant of [[argminD2]] for FP centroids (q34's
    * per-label mean quantizer): per centroid, d² folds LEFT-TO-RIGHT in
    * double over the float dims — bit-identical to the
    * `aggregate(zip_with(x, c, (a,b) => (a-b)*(a-b)), 0.0, +)` chain it
    * replaces — then rounds ×10⁶ ([[roundHalfAway]] == Spark `round`)
    * BEFORE the argmin, exactly as both engines' plans do (the rounding is
    * what makes the FP sum's order difference between Spark and DuckDB
    * immaterial at the compared precision). Ties to the lower cluster id.
    */
  def argminD2Double(x: ArrayData, centroids: Array[Array[Double]],
      clusterIds: Array[Int]): org.apache.spark.sql.catalyst.InternalRow = {
    val xs = x.toFloatArray()
    var bestD2 = Long.MaxValue
    var bestCl = Int.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val n = math.min(xs.length, cc.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = xs(i).toDouble - cc(i); s += d * d; i += 1 }
      val d2r = roundHalfAway(s * 1e6)
      if (d2r < bestD2 || (d2r == bestD2 && clusterIds(c) < bestCl)) {
        bestD2 = d2r
        bestCl = clusterIds(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD2, bestCl))
  }

  /** Symmetric-int8 quantization summary of one vector in ONE compiled
    * pass — scale = max|x|/127, qᵢ = round(xᵢ/scale), published as the
    * (scale_x1e9, Σq, Σq², min q, max q) struct of integer aggregates.
    * Bit-identical to the higher-order
    * `transform`/`aggregate`/`array_min`/`array_max` chain it replaces:
    * float→double casts are exact, max|x| is comparison-based, each qᵢ is
    * one IEEE division + [[roundHalfAway]] (== Spark `round` == DuckDB
    * `ROUND` on these magnitudes), and the sums are integer folds
    * (associative, so any engine's aggregation order matches). Empty
    * arrays (never produced by the embeddings tables) yield the zero
    * struct.
    */
  def quantizeInt8(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val fa = a.toFloatArray()
    if (fa.isEmpty)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L, 0L, 0L))
    var maxabs = 0.0
    var i = 0
    while (i < fa.length) {
      val v = math.abs(fa(i).toDouble)
      if (v > maxabs) maxabs = v
      i += 1
    }
    val scale = maxabs / 127.0
    var qSum = 0L
    var qSq = 0L
    var qMin = Long.MaxValue
    var qMax = Long.MinValue
    i = 0
    while (i < fa.length) {
      val q = if (scale == 0.0) 0L else roundHalfAway(fa(i).toDouble / scale)
      qSum += q
      qSq += q * q
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](roundHalfAway(scale * 1e9), qSum, qSq, qMin, qMax))
  }
}

/** `vec_dot(a, b)` — double dot product of two `array<float>` columns. */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.dot($a, $b)")

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `vec_lsh_bits(a)` — banded LSH signature of an `array<float>` column as
  * `array<bigint>` (band t's bits at index t). Band/plane counts are plan
  * constants, not runtime columns.
  */
case class VecLshBitsExpr(child: Expression, bands: Int, planesPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.lshBits(a.asInstanceOf[ArrayData], bands, planesPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecMath.lshBits($c, $bands, $planesPerBand)")

  override def prettyName: String = "vec_lsh_bits"
  override protected def withNewChildInternal(newChild: Expression): VecLshBitsExpr =
    copy(child = newChild)
}

/** `vec_quantize_int8(a)` — int8-quantization summary struct of an
  * `array<float>` column (see [[VecMath.quantizeInt8]]).
  */
case class VecQuantizeInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("scale_x1e9", LongType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_sq_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.quantizeInt8(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecMath.quantizeInt8($c)")

  override def prettyName: String = "vec_quantize_int8"
  override protected def withNewChildInternal(newChild: Expression): VecQuantizeInt8Expr =
    copy(child = newChild)
}

/** `vec_quantize_fixed(a, scale)` — fixed-point long quantization of an
  * `array<float>` column (see [[VecMath.quantizeFixed]]). The scale is a
  * plan constant, not a runtime column.
  */
case class VecQuantizeFixedExpr(child: Expression, scale: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.quantizeFixed(a.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecMath.quantizeFixed($c, $scale)")

  override def prettyName: String = "vec_quantize_fixed"
  override protected def withNewChildInternal(newChild: Expression): VecQuantizeFixedExpr =
    copy(child = newChild)
}

/** `vec_argmin_d2(x)` — nearest-centroid struct `(d2, cluster)` of a
  * quantized `array<bigint>` column against a constant k×d centroid matrix
  * (see [[VecMath.argminD2]]). The matrix is ONE reference-object operand —
  * never k plan literals — so analysis, codegen, and plan size are O(1) in
  * the centroid count.
  */
case class VecArgminD2Expr(child: Expression, centroids: Array[Array[Long]],
    clusterIds: Array[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if centroids.length == clusterIds.length &&
        centroids.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-empty centroid matrix aligned with its ids")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.argminD2(a.asInstanceOf[ArrayData], centroids, clusterIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val idsRef = ctx.addReferenceObj("clusterIds", clusterIds, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecMath.argminD2($c, $centRef, $idsRef)")
  }

  // arrays would print as [[J@... anyway; keep the plan string informative
  // and k-independent
  override def toString: String =
    s"vec_argmin_d2($child, k=${clusterIds.length})"
  override def prettyName: String = "vec_argmin_d2"
  override protected def withNewChildInternal(newChild: Expression): VecArgminD2Expr =
    copy(child = newChild)
}

/** `vec_argmin_d2d(x)` — FP-centroid variant of [[VecArgminD2Expr]] over an
  * `array<float>` column: left-to-right double d² fold, rounded ×10⁶ before
  * the argmin (see [[VecMath.argminD2Double]]). Same O(1)-in-k constant-
  * operand shape.
  */
case class VecArgminD2DoubleExpr(child: Expression, centroids: Array[Array[Double]],
    clusterIds: Array[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("d2r", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.length == clusterIds.length &&
        centroids.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-empty centroid matrix aligned with its ids")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.argminD2Double(a.asInstanceOf[ArrayData], centroids, clusterIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val idsRef = ctx.addReferenceObj("clusterIds", clusterIds, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecMath.argminD2Double($c, $centRef, $idsRef)")
  }

  override def toString: String =
    s"vec_argmin_d2d($child, k=${clusterIds.length})"
  override def prettyName: String = "vec_argmin_d2d"
  override protected def withNewChildInternal(newChild: Expression): VecArgminD2DoubleExpr =
    copy(child = newChild)
}

/** Column bindings for the native vector expressions. */
object VecExprs {
  private def toExpr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def toCol(e: Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def vec_dot(a: Column, b: Column): Column = toCol(VecDotExpr(toExpr(a), toExpr(b)))

  def vec_lsh_bits(a: Column, bands: Int, planesPerBand: Int): Column =
    toCol(VecLshBitsExpr(toExpr(a), bands, planesPerBand))

  def vec_quantize_int8(a: Column): Column = toCol(VecQuantizeInt8Expr(toExpr(a)))

  def vec_quantize_fixed(a: Column, scale: Double): Column =
    toCol(VecQuantizeFixedExpr(toExpr(a), scale))

  /** Argmin of integer squared-L2 against `cent` (clusterId → coordinate
    * row); rows are sorted by cluster id here so [[VecMath.argminD2]]'s
    * strict-< scan ties to the lowest id.
    */
  def vec_argmin_d2(x: Column, cent: Array[(Int, Array[Long])]): Column = {
    val sorted = cent.sortBy(_._1)
    toCol(VecArgminD2Expr(toExpr(x), sorted.map(_._2), sorted.map(_._1)))
  }

  def vec_argmin_d2d(x: Column, cent: Array[(Int, Array[Double])]): Column = {
    val sorted = cent.sortBy(_._1)
    toCol(VecArgminD2DoubleExpr(toExpr(x), sorted.map(_._2), sorted.map(_._1)))
  }

  /** Registration tuple for [[GraftExtensions]]. */
  private[functions] val registration = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
    (exprs: Seq[Expression]) => VecDotExpr(exprs.head, exprs(1)))
}
