package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native order-independent exact dot product of two float/double
  * arrays: each per-element double product is rounded to 15 decimal
  * places (exactly Spark's cast(double AS DECIMAL(30,15)) semantics —
  * BigDecimal from the canonical double string, HALF_UP) and summed
  * exactly, so the result is bit-identical to the compositional
  * zip_with + decimal-aggregate formulation AND to the DuckDB oracle,
  * while running as one compiled pass per row instead of interpreted
  * higher-order-function evaluation with per-element Decimal churn.
  */
@SerialVersionUID(1L)
case class DotExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_exact requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_exact"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotExact.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotExact.compute($a, $lf, $b, $rf)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExact =
    copy(left = newLeft, right = newRight)
}

object DotExact {
  /** Returns a PRIMITIVE double so generated code assigns it directly
    * (an Object return would make every codegen'd stage fail to
    * compile and silently fall back to interpreted execution).
    * Engine contract: equal-length arrays with non-null elements;
    * violations fail loudly rather than producing a silent null.
    */
  def compute(a: ArrayData, aFloat: Boolean,
              b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_exact: array length mismatch (${a.numElements()} vs ${b.numElements()})")
    var sum = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i) && !b.isNullAt(i),
        s"dot_exact: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val p = x * y
      sum = sum.add(new JBigDecimal(java.lang.Double.toString(p))
        .setScale(15, RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue()
  }

  def dot_exact(a: Column, b: Column): Column =
    ColumnShim.column(DotExact(ColumnShim.expression(a),
      ColumnShim.expression(b)))
}
