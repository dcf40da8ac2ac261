package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native banded sign-LSH signature: for a vector column, the
  * `bands`-element int array whose b-th value packs the r =
  * planes/bands sign bits of hyperplane projections b·r … b·r+r−1 —
  * the same `array<int>` the compositional
  * `transform(sequence, aggregate(zip_with))` form produces
  * (`Similarity.signBandArray`), consumed unchanged by `posexplode`.
  *
  * Arithmetic is BIT-IDENTICAL to the HOF form: per plane, the
  * projection is a sequential left fold of
  * `coalesce(x.toDouble * w, 0.0)` from a 0.0 seed — a null element
  * (or the zip_with padding when vector and plane lengths differ)
  * contributes exactly 0.0, a NaN product propagates, and the sign
  * test `proj >= 0` is false for NaN; the bit sum adds `1 << j` in
  * ascending j (DedupSimilaritySpec pins the equivalence against the
  * unrolled per-plane tree). The plane matrix rides the plan as a
  * flat double[] reference object — DATA, not code — so plan and
  * codegen size stay O(1) in planes while each row runs one compiled
  * loop instead of interpreting three nested lambda layers (the
  * same CentroidSqDists finding: the HOF ladder rungs with hundreds
  * of planes paid ~two orders of magnitude interpretive overhead).
  */
@SerialVersionUID(1L)
case class SignBands(child: Expression, planes: Seq[Seq[Double]],
                     bands: Int) extends UnaryExpression {

  require(planes.nonEmpty && bands > 0 && planes.length % bands == 0,
    s"sign_bands: bands ($bands) must divide planes (${planes.length})")
  require(planes.forall(_.length == planes.head.length),
    "sign_bands: ragged plane matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands requires array<float|double> input, got " +
        other.catalogString)
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "sign_bands"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = {
    val dim = planes.head.length
    val a = new Array[Double](planes.length * dim)
    var i = 0
    planes.foreach { p => p.foreach { w => a(i) = w; i += 1 } }
    a
  }

  override def nullSafeEval(v: Any): Any =
    SignBands.compute(v.asInstanceOf[ArrayData], isFloat, flat,
      planes.length, planes.head.length, bands)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planes", flat, "double[]")
    val f = isFloat
    val np = planes.length
    val dim = planes.head.length
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SignBands.compute($a, $f, $matRef, $np, $dim, $bands)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignBands = copy(child = newChild)
}

object SignBands {
  /** One compiled pass: per plane a sequential fold of
    * `coalesce(x * w, 0.0)` over min(vector, plane) length (the
    * zip_with padding's null products contribute exactly 0.0, so the
    * truncated loop is bit-identical), sign-tested into ascending
    * bit positions per band.
    */
  def compute(v: ArrayData, vFloat: Boolean, mat: Array[Double],
              nPlanes: Int, dim: Int, bands: Int): ArrayData = {
    val r = nPlanes / bands
    val n = v.numElements()
    val m = if (n < dim) n else dim
    val x = new Array[Double](m)
    val nul = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      if (v.isNullAt(i)) nul(i) = true
      else x(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 0
      var j = 0
      while (j < r) {
        val base = (b * r + j) * dim
        var proj = 0.0
        var t = 0
        while (t < m) {
          // coalesce(x*w, 0.0): a null element adds exactly 0.0
          if (!nul(t)) proj += x(t) * mat(base + t)
          else proj += 0.0
          t += 1
        }
        // NaN >= 0 is false — matches when(proj >= 0, ...).otherwise(0)
        if (proj >= 0) acc += (1 << j)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def sign_bands(vec: Column, planes: Seq[Seq[Double]],
                 bands: Int): Column =
    ColumnShim.column(SignBands(ColumnShim.expression(vec), planes, bands))
}
