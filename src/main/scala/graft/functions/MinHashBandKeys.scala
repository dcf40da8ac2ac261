package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-local minhash LSH band keys: one pass over a shingle array
  * computes all `k` portable-family min-hashes ([[Md5Seeded60]] per
  * seed — the family the DuckDB oracles replay) and folds each band's
  * `k / bands` signature slots into one 64-bit bucket key (XXH64 over
  * the band id then the slots, mirroring the engine's banded-join
  * convention; the bucket hash itself stays engine-internal, exactly
  * like the `xxhash64(band, slots…)` key in
  * [[graft.operators.Dedup.minhashNearDups]]).
  *
  * Why an expression and not the explode → groupBy signature pass: the
  * incremental-ingest near-dup path ([[graft.operators.Dedup.minhashNovel]])
  * must evaluate the REFERENCE corpus's band keys inside the scan
  * stage, under a Bloom membership predicate, so the corpus is pruned
  * with NO shuffle at all — the groupBy formulation shuffles one
  * signature row per corpus doc before any key exists to prune on,
  * and the pure-Column formulation re-inlines the shingle expression
  * into every one of the k min-slots under project collapse (the
  * measured 64× codegen blowup that motivated the groupBy form).
  * This expression computes shingles' hashes once, stays inside
  * whole-stage codegen via a static call, and emits `bands` longs.
  *
  * Empty shingle arrays yield an EMPTY key array (a (&lt;ngram)-token
  * doc belongs to no band bucket — the same semantics as the explode
  * path, where such docs produce no signature row).
  */
@ExpressionDescription(
  usage = "minhash_band_keys(shingles) - array of LSH band bucket keys.")
case class MinHashBandKeys(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(k > 0 && bands > 0 && k % bands == 0,
    s"bands ($bands) must divide the signature width ($k)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_band_keys requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  // per-seed "seed:" prefixes, computed once and shipped into
  // generated code as one reference object
  private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(seed => s"$seed:".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(prefixes, bands, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixesRef = ctx.addReferenceObj("seedPrefixes", prefixes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBandKeys.compute($prefixesRef, $bands, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {
  /** Static so generated code can call it directly. One md5 per
    * (shingle, seed) — identical work to the k seeded hashes of the
    * explode path, with zero shuffle.
    */
  def compute(prefixes: Array[Array[Byte]], bands: Int,
              arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val k = prefixes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes // one payload copy per shingle, not per seed
        var seed = 0
        while (seed < k) {
          val h = Md5Seeded60.computeBytes(prefixes(seed), bytes)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    val r = k / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, 42L)
      var j = 0
      while (j < r) {
        h = XXH64.hashLong(mins(b * r + j), h)
        j += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column-API entry point. */
  def minhash_band_keys(shingles: Column, k: Int, bands: Int): Column =
    ColumnShim.column(
      MinHashBandKeys(ColumnShim.expression(shingles), k, bands))
}
