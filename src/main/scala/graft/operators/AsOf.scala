package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single latest
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Implemented with the union + last_value-over-window pattern rather
  * than a per-row correlated lookup: both sides are tagged and
  * unioned, sorted within each key by (ts, side, tiebreak), and the
  * right payload is carried forward with last(ignoreNulls). This is
  * the scalable shape — ONE shuffle on the join key, no range
  * explosion, no broadcast requirement — and it degrades gracefully
  * under skew (AQE splits hot keys like any window).
  *
  * Ties: among right rows with the same timestamp the highest
  * `rightTieBreak` wins (deterministic).
  */
object AsOf {

  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               rightTieBreak: String,
               payload: Seq[String]): DataFrame =
    asofJoinDirected(left, leftKey, leftTs, right, rightKey, rightTs,
      rightTieBreak, payload, direction = "backward")
      .drop("__asof_ts")

  /** The general form: `direction` ∈ backward | forward | nearest,
    * with an optional match-distance cap (`toleranceSec`) — the full
    * pandas/QuestDB-style ASOF surface.
    *
    * Still ONE shuffle on the join key: the forward pass is the
    * backward algorithm on reversed event time, expressed as a second
    * window over the SAME unioned frame (same partitioning, different
    * intra-partition order — Spark re-sorts within partitions, it
    * does not re-exchange), and `nearest` picks per row between the
    * two carried candidates by absolute distance (tie → backward).
    * Tolerance nulls out a match strictly farther than the cap
    * (distance measured in exact microseconds).
    *
    * Output adds `__asof` (the matched payload struct, null if no
    * in-tolerance match) and `__asof_ts` (the matched right
    * timestamp).
    */
  def asofJoinDirected(left: DataFrame, leftKey: String, leftTs: String,
                       right: DataFrame, rightKey: String, rightTs: String,
                       rightTieBreak: String, payload: Seq[String],
                       direction: String = "backward",
                       toleranceSec: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoinDirected: unknown direction '$direction'")
    val payloadStruct = struct(payload.map(col): _*)
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTs).as("__t"),
      col(rightTieBreak).cast("long").as("__tb"),
      payloadStruct.as("__p"),
      lit(0).as("__side"))
    val payloadType = r.schema("__p").dataType
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs))
      .withColumn("__tb", lit(Long.MaxValue))
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward = backward on reversed time; at equal ts the right row
    // still sorts before the left (side 0 first), so an exactly-equal
    // timestamp is eligible in BOTH directions, and the highest
    // tiebreak is still the last right row seen before the left one
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolMicros = toleranceSec.map(_ * 1000000L)
    def gated(p: Column, mt: Column, dist: Column): (Column, Column) =
      tolMicros match {
        case Some(tm) =>
          (when(dist <= tm, p), when(dist <= tm, mt))
        case None => (p, mt)
      }
    // events carry TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
    // cast to TIMESTAMP is deterministic and unix_micros stays exact
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val lm = micros(col("__t"))
    val withDir = direction match {
      case "backward" =>
        val b = u
          .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(wb))
          .withColumn("__tsb", last(when(col("__side") === 0, col("__t")),
            ignoreNulls = true).over(wb))
        val (p, mt) = gated(col("__pb"), col("__tsb"),
          lm - micros(col("__tsb")))
        b.withColumn("__asof", p).withColumn("__asof_ts", mt)
      case "forward" =>
        val f = u
          .withColumn("__pf", last(col("__p"), ignoreNulls = true).over(wf))
          .withColumn("__tsf", last(when(col("__side") === 0, col("__t")),
            ignoreNulls = true).over(wf))
        val (p, mt) = gated(col("__pf"), col("__tsf"),
          micros(col("__tsf")) - lm)
        f.withColumn("__asof", p).withColumn("__asof_ts", mt)
      case "nearest" =>
        val both = u
          .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(wb))
          .withColumn("__tsb", last(when(col("__side") === 0, col("__t")),
            ignoreNulls = true).over(wb))
          .withColumn("__pf", last(col("__p"), ignoreNulls = true).over(wf))
          .withColumn("__tsf", last(when(col("__side") === 0, col("__t")),
            ignoreNulls = true).over(wf))
        val db = lm - micros(col("__tsb"))
        val df = micros(col("__tsf")) - lm
        val (pb, mb) = gated(col("__pb"), col("__tsb"), db)
        val (pf, mf) = gated(col("__pf"), col("__tsf"), df)
        // backward wins ties and any case where forward is absent
        val pickB = pf.isNull || (pb.isNotNull && db <= df)
        both
          .withColumn("__asof", when(pickB, pb).otherwise(pf))
          .withColumn("__asof_ts", when(pickB, mb).otherwise(mf))
    }
    withDir.filter(col("__side") === 1)
      .drop("__k", "__t", "__tb", "__p", "__side",
        "__pb", "__tsb", "__pf", "__tsf")
  }
}
