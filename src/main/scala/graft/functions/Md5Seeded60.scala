package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable 60-bit seeded hash
  * family ([[graft.operators.Dedup.md5Seeded]]): the top 60 bits of
  * md5("seed:" ++ s) as a non-negative long — bit-identical to the
  * compositional `conv(substring(md5(concat('seed:', s)), 1, 15), 16,
  * 10)` (15 hex digits = first 7.5 digest bytes), which is what the
  * DuckDB oracles replay.
  *
  * The compositional form allocates a 32-char hex string, a substring,
  * and a radix conversion per call; minhash evaluates the family k=16
  * times per shingle, so those allocations dominate the signature
  * pass. This expression digests the bytes directly (thread-local
  * MessageDigest, zero intermediate strings) and stays inside
  * whole-stage codegen via a static call.
  */
@ExpressionDescription(
  usage = "md5_seeded60(str) - top 60 bits of md5('seed:' || str) as BIGINT.")
case class Md5Seeded60(seed: Int, child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_seeded60 requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_seeded60"

  // "seed:" prefix bytes, computed once per expression instance and
  // shipped into generated code as a reference object
  private lazy val prefix: Array[Byte] = s"$seed:".getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    Md5Seeded60.compute(prefix, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("seedPrefix", prefix, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Seeded60.compute($prefixRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Seeded60 =
    copy(child = newChild)
}

object Md5Seeded60 {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it directly. */
  def compute(prefix: Array[Byte], s: UTF8String): Long =
    computeBytes(prefix, s.getBytes)

  /** Byte-array form — lets k-seed callers ([[MinHashBandKeys]]) copy
    * the UTF8String payload once per shingle instead of once per
    * (shingle, seed).
    */
  def computeBytes(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val md = mdPool.get()
    md.reset()
    md.update(prefix)
    md.update(bytes)
    val d = md.digest()
    // first 15 hex digits = first 7.5 bytes: big-endian first 8 bytes,
    // dropped low nibble → always non-negative (< 2^60)
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }

  /** Column-API entry point. */
  def md5_seeded60(seed: Int, s: Column): Column =
    ColumnShim.column(Md5Seeded60(seed, ColumnShim.expression(s)))
}
