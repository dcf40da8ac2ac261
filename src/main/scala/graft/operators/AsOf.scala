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
               payload: Seq[String]): DataFrame = {
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
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__tb", "__p", "__side")
  }
}
