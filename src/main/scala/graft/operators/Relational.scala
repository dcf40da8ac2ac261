package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational workload over the TPC-H-ish star schema — the generic
  * scan/filter/join/aggregate/top-k surface (SURVEY §2.2-§2.5 applied
  * to the warehouse tables) and the bench headliners.
  *
  * Scale design:
  *  - q1 is a pure scan+hash-agg: partial aggregation map-side, the
  *    shuffle carries ≤ (flags × statuses) rows per partition.
  *  - q3/q5: only truly bounded dims (region→nation — ≤25 rows at any
  *    scale factor) carry an explicit broadcast hint. customer and
  *    supplier GROW with scale factor, so hard-coding broadcast on
  *    them would OOM at 100×; they are left unhinted and AQE +
  *    autoBroadcastJoinThreshold picks broadcast while they fit and
  *    falls back to a shuffled join (with skew splitting) beyond that.
  *    orders⋈lineitem is a genuine distributed join on the natural
  *    key both sides already share.
  *  - top-k results go through TakeOrderedAndProject.
  */
object Relational {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.DecimalType

  /** Order-independent exact sum of a double expression: per-row cast
    * to decimal(30,10) (deterministic), exact decimal summation (no
    * float reassociation error across partials), result as double.
    * This is what makes aggregate results bit-identical between Spark
    * partial aggregation (arbitrary partition order) and the DuckDB
    * oracle — plain double sums differ in the last ulps depending on
    * summation order.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 10))).cast("double")

  /** TPC-H Q1-flavored pricing summary over lineitem. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(dsum(col("l_quantity")), 2).as("sum_qty"),
        round(dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
        round(dsum(col("l_extendedprice")) / count(lit(1)), 4).as("avg_price"),
        round(dsum(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-flavored: top-10 unshipped orders by revenue for a
    * market segment.
    */
  def topRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-flavored: revenue by nation for one region/year, through
    * the full region→nation→customer→orders→lineitem→supplier chain.
    */
  def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val dims = broadcast(nation.join(broadcast(region),
      col("n_regionkey") === col("r_regionkey")))
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val li = Tables.lineitem(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Full-outer data-quality reconciliation: customers vs event users —
    * how many keys exist on both sides, only in the dimension, or only
    * in the stream. One full outer join on the key, then a single-pass
    * conditional rollup.
    */
  def userCoverage(s: SparkSession, d: String): DataFrame = {
    val evUsers = Tables.events(s, d).select(col("user_id")).distinct()
    val cust = Tables.customer(s, d).select(col("c_custkey"))
    evUsers.join(cust, col("user_id") === col("c_custkey"), "full_outer")
      .agg(
        count(when(col("user_id").isNotNull && col("c_custkey").isNotNull, 1))
          .as("matched"),
        count(when(col("user_id").isNotNull && col("c_custkey").isNull, 1))
          .as("event_only"),
        count(when(col("user_id").isNull && col("c_custkey").isNotNull, 1))
          .as("customer_only"))
  }

  /** Pivot: per-segment event-type counts as wide columns — Spark's
    * pivot operator with an explicit value list (explicit values keep
    * the plan single-pass; an open pivot needs a distinct pre-query).
    */
  def eventsPivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .join(Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("c_mktsegment"), lit("UNKNOWN")))
      .groupBy(col("segment"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("segment"))
  }

  /** Events joined to the user dimension derived from customer —
    * the J1 fact→dim enrichment analog at warehouse shape: per
    * (market segment, event_type) event counts and value sums.
    */
  def eventsBySegment(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    ev.join(cust, Seq("user_id"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(dsum(col("value")), 2).as("value_sum"))
      .orderBy(col("segment"), col("event_type"))
  }
}
