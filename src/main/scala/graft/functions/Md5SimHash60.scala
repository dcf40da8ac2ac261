package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Scan-local PORTABLE simhash: the 60-bit md5-family sketch of
  * [[graft.operators.Dedup.simhashPortable]] (per token, h =
  * md5-seeded-60 hash under seed 0; per bit, ±1 votes; sketch bit =
  * vote ≥ 0) computed in ONE pass over the token array inside the
  * scan stage — bit-identical to the explode → 60-vote-column groupBy
  * formulation the DuckDB oracles replay, with no shuffle and no
  * per-doc aggregation row.
  *
  * Exists for the incremental-ingest path
  * ([[graft.operators.Dedup.simhashNovel]]): the reference corpus's
  * sketch must be evaluable under a Bloom band-membership predicate
  * at the scan, where the groupBy formulation would shuffle one vote
  * row per corpus doc before any band key exists to prune on. The
  * xxhash64-family [[SimHash64]] remains the engine-only fast path.
  *
  * An empty token array yields the all-ones sketch (zero votes tie to
  * ≥ 0) — unreachable from text input: `split(trim(text), "\\s+")`
  * emits at least one (possibly empty) token.
  */
@ExpressionDescription(
  usage = "md5_simhash60(tokens) - portable 60-bit simhash of a token array.")
case class Md5SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_simhash60 requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"

  override def nullSafeEval(input: Any): Any =
    Md5SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60 =
    copy(child = newChild)
}

object Md5SimHash60 {
  private val Bits = 60
  private val prefix0: Array[Byte] = "0:".getBytes("UTF-8")

  /** Static so generated code can call it directly. One md5 per
    * token; one payload copy per token.
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Md5Seeded60.computeBytes(prefix0, s.getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) >= 0) sketch |= 1L << b
      b += 1
    }
    sketch
  }

  /** Column-API entry point. */
  def md5_simhash60(tokens: Column): Column =
    ColumnShim.column(Md5SimHash60(ColumnShim.expression(tokens)))
}
