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
    * on negative ties (it rounds toward +∞).
    */
  private def roundHalfAway(v: Double): Long =
    (if (v >= 0) math.floor(v + 0.5) else -math.floor(-v + 0.5)).toLong

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

/** Column bindings for the native vector expressions. */
object VecExprs {
  private def toExpr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def toCol(e: Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def vec_dot(a: Column, b: Column): Column = toCol(VecDotExpr(toExpr(a), toExpr(b)))

  def vec_lsh_bits(a: Column, bands: Int, planesPerBand: Int): Column =
    toCol(VecLshBitsExpr(toExpr(a), bands, planesPerBand))

  /** Registration tuple for [[GraftExtensions]]. */
  private[functions] val registration = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
    (exprs: Seq[Expression]) => VecDotExpr(exprs.head, exprs(1)))
}
