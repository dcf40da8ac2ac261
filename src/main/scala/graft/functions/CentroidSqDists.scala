package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native squared-distance table for coarse-quantizer assignment:
  * for a vector column, the array of (squared L2 distance, centroid
  * id) structs against a broadcast centroid matrix — the same
  * `array<struct<d, cid>>` the compositional
  * `transform(sequence(...), zip_with + aggregate)` form produces
  * (`Similarity.centroidDistArray`), consumed unchanged by
  * `array_min` (nearest) / `array_sort` + `slice` (nprobe lists).
  *
  * Arithmetic is BIT-IDENTICAL to the higher-order-function form:
  * per element `(x.toDouble - w)` squared, summed in a sequential
  * left fold starting at 0.0 — the exact IEEE op sequence of
  * `aggregate(zip_with(...), 0.0, _ + _)` (DedupSimilaritySpec pins
  * the equivalence against the unrolled expression tree). What
  * changes is the cost: the HOF form interprets two lambda layers
  * and allocates a zipped array per centroid per row (measured
  * ~0.1 GFLOP/s at nlist=1024 — Scale1Prof `sf10 semdedup
  * decompose`), while this runs one compiled loop over a flat
  * `double[]` reference object per row. The centroid matrix rides
  * the plan as DATA (a reference object, not code), so plan and
  * codegen size stay O(1) in nlist — the same property that made
  * the HOF form the past-the-unroll-ceiling dial, without its
  * interpretive overhead.
  *
  * Engine contract: vector length must equal the centroid dim
  * (fails loudly, both dims named — the seam-guard house style);
  * elements non-null.
  */
@SerialVersionUID(1L)
case class CentroidSqDists(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "centroid_sq_dists: empty centroid set")
  require(cents.forall(_.length == cents.head.length),
    "centroid_sq_dists: ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_sq_dists requires array<float|double> input, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", DoubleType, nullable = false),
      StructField("cid", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "centroid_sq_dists"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // flat row-major copy: one cache-friendly double[] instead of a
  // per-centroid object graph (also what the codegen references)
  @transient private lazy val flat: Array[Double] = {
    val dim = cents.head.length
    val a = new Array[Double](cents.length * dim)
    var i = 0
    cents.foreach { c => c.foreach { w => a(i) = w; i += 1 } }
    a
  }

  override def nullSafeEval(v: Any): Any =
    CentroidSqDists.compute(v.asInstanceOf[ArrayData], isFloat, flat,
      cents.length, cents.head.length)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", flat, "double[]")
    val f = isFloat
    val k = cents.length
    val dim = cents.head.length
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.CentroidSqDists.compute($a, $f, $centsRef, $k, $dim)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidSqDists = copy(child = newChild)
}

object CentroidSqDists {
  /** One compiled pass: k sequential-fold squared distances over a
    * flat row-major centroid matrix. Fold order per centroid is
    * element order with a 0.0 seed — bit-identical to the
    * zip_with + aggregate composition.
    */
  def compute(v: ArrayData, vFloat: Boolean, cents: Array[Double],
              k: Int, dim: Int): ArrayData = {
    require(v.numElements() == dim,
      s"centroid_sq_dists: vector dim ${v.numElements()} != centroid dim $dim")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      require(!v.isNullAt(i), s"centroid_sq_dists: null element at index $i")
      x(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var j = 0
      while (j < dim) {
        val dlt = x(j) - cents(base + j)
        acc += dlt * dlt
        j += 1
      }
      out(c) = InternalRow(acc, c)
      c += 1
    }
    new GenericArrayData(out)
  }

  def centroid_sq_dists(vec: Column, cents: Array[Array[Double]]): Column =
    ColumnShim.column(CentroidSqDists(ColumnShim.expression(vec),
      cents.map(_.toSeq).toSeq))
}
