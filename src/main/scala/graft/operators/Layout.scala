package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order / Morton clustering) and the
  * min-max file-skipping audit that justifies it.
  *
  * Why this exists at 100 TB: a fact table physically sorted on ONE
  * column (arrival time, say) serves time-range scans well but makes
  * every per-user scan read the whole table — each file spans the full
  * user domain. Interleaving the bits of two (or more) dimension keys
  * into a single Morton key and range-partitioning + sorting on it
  * gives every file a SMALL bounding box in BOTH dimensions, so a
  * format layer that keeps per-file min/max statistics (Delta, Iceberg,
  * or plain parquet row-group stats under predicate pushdown) can skip
  * all files whose box misses the query's box. This is the standard
  * OPTIMIZE ZORDER technique; everything here is plain public Spark —
  * the key is a pure codegen'd Column expression, the layout write is
  * `repartitionByRange(zkey) + sortWithinPartitions(zkey)`, and the
  * audit reads per-file min/max back with `input_file_name()`.
  *
  * Exactness contract (cross-engine oracle): bucket scaling is done in
  * IEEE double arithmetic — `floor((v - min) * 65535.0 / (max - min))`
  * — which both Spark and DuckDB evaluate bit-identically, so the
  * Morton keys hash-match without any integer-division caveats. The
  * double path is exact as long as `(v - min) * 65535` stays below
  * 2^53 (domain span below ~2^37), which `writeZOrdered` asserts on
  * the driver-side bounds it collects.
  */
object Layout {

  /** Spread the low 16 bits of `c` into the even bit positions of a
    * 32-bit value (magic-number Morton spreading, 4 codegen'd steps).
    */
  def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Spread the low 21 bits of `c` to every third bit position (3-D
    * Morton spreading, 5 codegen'd steps).
    */
  def spread21(c: Column): Column = {
    val c0 = c.bitwiseAND(lit(0x1FFFFFL))
    val s1 = c0.bitwiseOR(shiftleft(c0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Scale `v` from [mn, mx] onto the 21-bit bucket grid (the 3-D
    * analog of [[bucket16]]; same IEEE-double exactness contract with
    * the span bound relaxed to 2^32).
    */
  def bucket21(v: Column, mn: Column, mx: Column): Column =
    when(mx <= mn, lit(0L)).otherwise(
      floor((v - mn).cast("double") * lit(2097151.0d) /
        (mx - mn).cast("double")).cast("long"))

  /** 63-bit Morton key over three 21-bit buckets — three-dimensional
    * clustering (e.g. user × time × entity) for box scans over three
    * predicates; same write/audit machinery as the 2-D key.
    */
  def mortonKey3(xb: Column, yb: Column, zb: Column): Column =
    spread21(xb)
      .bitwiseOR(shiftleft(spread21(yb), 1))
      .bitwiseOR(shiftleft(spread21(zb), 2))

  /** Scale `v` from [mn, mx] onto the 16-bit bucket grid 0..65535.
    * Pure IEEE double arithmetic (see the exactness contract above);
    * a degenerate domain (mx == mn) maps everything to bucket 0.
    */
  def bucket16(v: Column, mn: Column, mx: Column): Column =
    when(mx <= mn, lit(0L)).otherwise(
      floor((v - mn).cast("double") * lit(65535.0d) /
        (mx - mn).cast("double")).cast("long"))

  /** 32-bit Morton key interleaving two 16-bit buckets: `xb` occupies
    * the even bits, `yb` the odd bits. Monotone locality: nearby
    * (x, y) points share key prefixes, so range-partitioning on the
    * key gives every partition a small bounding box in both dims.
    */
  def mortonKey(xb: Column, yb: Column): Column =
    spread16(xb).bitwiseOR(shiftleft(spread16(yb), 1))

  /** Morton key for raw values given their domain bounds. */
  def zkey(x: Column, xMn: Column, xMx: Column,
           y: Column, yMn: Column, yMx: Column): Column =
    mortonKey(bucket16(x, xMn, xMx), bucket16(y, yMn, yMx))

  /** Write `df` parquet Z-ordered on two long-valued columns.
    *
    * One driver-side bounds collect (4 longs — bounded regardless of
    * scale), then the key is computed scan-locally from literal bounds
    * and the frame is range-partitioned + sorted on it. The key column
    * itself is dropped from the files: the layout is physical, the
    * schema is unchanged. `numFiles` sizes the output (at 100 TB this
    * is total_bytes / target_file_bytes, not a per-query knob).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
                    yCol: String, numFiles: Int): Unit = {
    val Array(b) = df.agg(
      min(col(xCol)).cast("long").as("xmn"),
      max(col(xCol)).cast("long").as("xmx"),
      min(col(yCol)).cast("long").as("ymn"),
      max(col(yCol)).cast("long").as("ymx")).collect()
    val (xMn, xMx) = (b.getLong(0), b.getLong(1))
    val (yMn, yMx) = (b.getLong(2), b.getLong(3))
    require((xMx - xMn) < (1L << 37) && (yMx - yMn) < (1L << 37),
      s"domain span exceeds the exact-double bucket bound: " +
        s"x=${xMx - xMn} y=${yMx - yMn} (rescale the column first)")
    val keyed = df.withColumn("__zkey",
      zkey(col(xCol).cast("long"), lit(xMn), lit(xMx),
        col(yCol).cast("long"), lit(yMn), lit(yMx)))
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Baseline layout: range-partition + sort on a single column (the
    * one-dimensional clustering Z-order replaces).
    */
  def writeLinear(df: DataFrame, path: String, c: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(c))
      .sortWithinPartitions(col(c))
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max statistics for two columns — the file-skipping
    * index a format layer would keep. One distributed pass; output is
    * one row per file (bounded by the file count, never by rows).
    */
  def fileStats(s: SparkSession, path: String, xCol: String,
                yCol: String): DataFrame =
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /** Of `stats`' files, those whose bounding box intersects the query
    * box — the files a stats-pruning reader would actually open.
    */
  def candidateFiles(stats: DataFrame,
                     xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame =
    stats.filter(col("x_max") >= xLo && col("x_min") <= xHi &&
      col("y_max") >= yLo && col("y_min") <= yHi)
}
