package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's dashboard / behavioral analytics (SURVEY §2.4-§2.5)
  * over the activity view.
  *
  * Scale design notes:
  *  - [[stats]] collapses the reference's 7 sequential single-value
  *    queries (app.py:297-306) into ONE scan with conditional
  *    aggregates — at 100 TB that is 1 pass instead of 7.
  *  - Top-k queries go through orderBy(...).limit(k) which Spark plans
  *    as TakeOrderedAndProject (per-partition heaps + driver merge of
  *    k rows, no global sort).
  *  - Time-bucket aggregations group by date_trunc — partial
  *    aggregation map-side; cardinality after grouping is tiny
  *    (hours × types), so the shuffle moves only partial aggregates.
  *  - "Rolling window relative to NOW" predicates are anchored to
  *    max(access_timestamp) instead of the wall clock so results are
  *    deterministic and oracle-replayable; the anchor is computed in
  *    the same job via a scalar subquery-style cross join of a 1-row
  *    aggregate (broadcast, no extra pass over the fact).
  */
object Analytics {

  /** Per-(user, date, hour) activity counts — the shared base of the
    * baseline / z-score / MAD analytics (one definition, one oracle
    * shape to keep in lockstep).
    */
  private def hourlyCounts(activity: DataFrame): DataFrame =
    activity
      .groupBy(col("user_id"), to_date(col("access_timestamp")).as("d"),
        hour(col("access_timestamp")).as("h"))
      .agg(count(lit(1)).as("cnt"))

  /** Formatted hour bucket shared by the timeline queries. */
  private def hourBucket: Column =
    date_format(date_trunc("hour", col("access_timestamp")), "yyyy-MM-dd HH:00")

  /** A1+A2 — the get_stats block (reference app.py:294-306) in a
    * single pass: total / suspicious-analog (Failed) / per-op counts.
    */
  def stats(activity: DataFrame): DataFrame =
    activity.agg(
      count(lit(1)).as("total_activities"),
      count(when(col("operation_status") === "Failed", 1)).as("failed_activities"),
      count(when(col("operation_type") === "SELECT", 1)).as("select_count"),
      count(when(col("operation_type") === "INSERT", 1)).as("insert_count"),
      count(when(col("operation_type") === "UPDATE", 1)).as("update_count"),
      count(when(col("operation_type") === "DELETE", 1)).as("delete_count"),
      count_distinct(col("user_id")).as("distinct_users"),
      sum(coalesce(col("rows_affected"), lit(0L))).as("total_rows_affected"))

  /** A3 — group-by operation counts (reference app.py:303). */
  def opsByType(activity: DataFrame): DataFrame =
    activity.groupBy(col("operation_type"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("rows_affected"), lit(0L))).as("rows_total"))
      .orderBy(col("operation_type"))

  /** A4 — top-K users leaderboard (reference app.py:304): top 5 by
    * activity count; deterministic tie-break on username.
    */
  def topUsers(activity: DataFrame, k: Int = 5): DataFrame =
    activity.groupBy(col("username"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("username"))
      .limit(k)

  /** A4 at scale — two-phase salted top-K: pre-aggregate on
    * (key, salt) so one hot key spreads over `salt` reducers, then
    * combine partials. Result is identical to [[topUsers]]; the shape
    * survives a key owning an arbitrary share of a 100 TB table.
    */
  def topUsersSalted(activity: DataFrame, k: Int = 5,
                     salt: Int = 16): DataFrame =
    activity
      .withColumn("__salt", pmod(xxhash64(col("activity_id")), lit(salt.toLong)))
      .groupBy(col("username"), col("__salt"))
      .agg(count(lit(1)).as("pc"))
      .groupBy(col("username"))
      .agg(sum(col("pc")).as("n"))
      .orderBy(col("n").desc, col("username"))
      .limit(k)

  /** A5 — hourly timeline (reference app.py:308-318): per-hour counts,
    * failed counts, rows_affected sums. Bucket emitted as a formatted
    * string (reference DATE_FORMAT '%Y-%m-%d %H:00') to keep the
    * oracle type-stable.
    */
  def timelineHourly(activity: DataFrame): DataFrame =
    activity
      .groupBy(hourBucket.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("operation_status") === "Failed", 1)).as("n_failed"),
        sum(coalesce(col("rows_affected"), lit(0L))).as("rows_total"))
      .orderBy(col("bucket"))

  /** A6 — two-key behavior profile (reference app.py:448-461):
    * hour-of-day × operation_type counts. The reference's dict folds
    * overwrite on duplicate keys (documented bug, SURVEY §2.4 A6);
    * we compute the corrected sums.
    */
  def behaviorProfile(activity: DataFrame): DataFrame =
    activity
      .groupBy(hour(col("access_timestamp")).cast("long").as("hr"),
        col("operation_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hr"), col("operation_type"))

  /** A7 — per-user statistical baseline (reference app.py:522-532):
    * avg / population-stddev of hourly activity counts. MySQL STDDEV
    * is population stddev → stddev_pop (SURVEY §2.4 A7).
    */
  def userBaseline(activity: DataFrame): DataFrame =
    hourlyCounts(activity)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("user_id"),
        // population stddev via exact integer sums (σ² = (nΣx²-(Σx)²)/n²)
        // — bit-deterministic, unlike streaming stddev accumulators
        round(col("s").cast("double") / col("n"), 4).as("avg_per_hour"),
        round(sqrt((col("n").cast("double") * col("s2") -
          col("s").cast("double") * col("s")) /
          (col("n").cast("double") * col("n"))), 4).as("std_per_hour"),
        col("n").as("active_hours"))
      .orderBy(col("user_id"))

  /** A8 — rate-limit window (reference app.py:105-108,396-403):
    * per-(user, minute) tumbling counts with the over-threshold flag.
    * The exact trailing-60s sliding variant lives in the streaming
    * path ([[graft.streaming.Ingest]]); this tumbling form is the
    * batch/oracle-parity shape.
    */
  def ratePerMinute(activity: DataFrame, threshold: Int = 100): DataFrame =
    activity
      .groupBy(col("user_id"),
        date_format(date_trunc("minute", col("access_timestamp")),
          "yyyy-MM-dd HH:mm").as("minute"))
      .agg(count(lit(1)).as("n"))
      .withColumn("over_limit", col("n") > threshold)
      .orderBy(col("user_id"), col("minute"))

  /** A9 — z-score anomaly (reference app.py:534-544): each user's
    * activity count in the trailing hour (anchored at max ts) vs
    * avg + 3·stddev of their hourly baseline (stddev null → 1).
    */
  def anomalyZScore(activity: DataFrame): DataFrame = {
    val anchor = activity.agg(max(col("access_timestamp")).as("max_ts"))
    val recent = activity
      .crossJoin(broadcast(anchor))
      .filter(col("access_timestamp") >=
        col("max_ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("recent_cnt"))
    val baseline = hourlyCounts(activity)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("user_id"),
        (col("s").cast("double") / col("n")).as("avg_cnt"),
        sqrt((col("n").cast("double") * col("s2") -
          col("s").cast("double") * col("s")) /
          (col("n").cast("double") * col("n"))).as("std_cnt"))
    recent.join(baseline, Seq("user_id"), "inner")
      .select(
        col("user_id"),
        col("recent_cnt"),
        round(col("avg_cnt"), 4).as("avg_cnt"),
        round(col("std_cnt"), 4).as("std_cnt"),
        (col("recent_cnt") > col("avg_cnt") + lit(3) * col("std_cnt"))
          .as("is_anomalous"))
      .orderBy(col("user_id"))
  }

  /** W2 — "impossible travel" analog (reference app.py:546-552): per
    * username, consecutive events from different IPs within 1 hour.
    * lag() over (user, ts) — one shuffle by user, then a per-row
    * comparison; at scale the partition key is the natural entity key
    * so skew tracks the hottest user (AQE skew-split handles it).
    */
  def ipSwitches(activity: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("username"))
      .orderBy(col("access_timestamp"), col("activity_id"))
    activity
      .withColumn("prev_ip", lag(col("ip_address"), 1).over(w))
      .withColumn("prev_ts", lag(col("access_timestamp"), 1).over(w))
      .filter(col("prev_ip").isNotNull &&
        col("prev_ip") =!= col("ip_address") &&
        col("access_timestamp") <= col("prev_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("username"), col("activity_id"),
        col("ip_address"), col("prev_ip"),
        unix_timestamp(col("access_timestamp"))
          .minus(unix_timestamp(col("prev_ts"))).as("gap_seconds"))
      .orderBy(col("username"), col("activity_id"))
  }

  /** A10 — geo enrichment + top-N countries (reference app.py:709-731:
    * IP→geo lookup with memo cache, Counter.most_common(10)). The HTTP
    * lookup becomes a broadcast-joined static geo dim keyed by the
    * routable IP octet; the counter becomes groupBy + TakeOrdered.
    */
  def geoDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val countries = Seq("US", "IN", "DE", "BR", "JP")
    spark.range(50).select(col("id").as("octet"),
      element_at(array(countries.map(lit): _*), (col("id") % 5 + 1).cast("int"))
        .as("country"))
  }

  def geoTopCountries(activity: DataFrame, k: Int = 10): DataFrame = {
    val spark = activity.sparkSession
    activity
      .withColumn("octet",
        split(col("ip_address"), "\\.").getItem(2).cast("long"))
      .join(broadcast(geoDim(spark)), Seq("octet"))
      .groupBy(col("country"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("country"))
      .limit(k)
  }

  /** J5 — referential hygiene as an anti-join: activity rows whose
    * user has no row in the user dimension (reference FK ON DELETE
    * semantics, sql/02_create_tables.sql:46).
    */
  def orphanActivity(activity: DataFrame, userDim: DataFrame,
                     dimKey: String): DataFrame =
    activity
      .join(userDim, col("user_id") === col(dimKey), "left_anti")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  /** Gap-based sessionization over the event stream: a new session
    * starts after `gapMinutes` of inactivity. Two window passes over
    * the same (user, ts) partitioning — one shuffle total, the second
    * window reuses the partitioning/sort of the first.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"),
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_ts"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Robust anomaly scoring via median absolute deviation: per user,
    * the median of hourly counts and MAD; hours where
    * |cnt − median| > 3·MAD are flagged. Medians via exact
    * interpolated percentile (deterministic, oracle-matched).
    * Resistant to the heavy-tailed activity bursts that wreck
    * mean/stddev baselines.
    */
  def madAnomalies(activity: DataFrame): DataFrame = {
    val hourly = hourlyCounts(activity)
    val med = hourly.groupBy(col("user_id"))
      .agg(expr("percentile(cnt, 0.5)").as("med"))
    val mad = hourly.join(med, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(expr("percentile(abs(cnt - med), 0.5)").as("mad"),
        first(col("med")).as("med"))
    hourly.join(mad, Seq("user_id"))
      .filter(abs(col("cnt") - col("med")) > lit(3.0) * greatest(col("mad"), lit(0.5)))
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("h").cast("long").as("hr"), col("cnt"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"))
      .orderBy(col("user_id"), col("day"), col("hr"))
  }

  /** Dense hourly timeline with gap filling: every hour between the
    * table's min and max gets a row, zero-filled where no events
    * occurred — sequence() + explode generates the spine, the counts
    * left-join onto it. Spine generation is one tiny job; the join is
    * broadcast (spine cardinality = hours, not rows).
    */
  def timelineDense(activity: DataFrame): DataFrame = {
    val bounds = activity.agg(
      date_trunc("hour", min(col("access_timestamp"))).as("t0"),
      date_trunc("hour", max(col("access_timestamp"))).as("t1"))
    val spine = bounds.select(explode(
        sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("bucket_ts"))
      .select(date_format(col("bucket_ts"), "yyyy-MM-dd HH:00").as("bucket"))
    val counts = activity
      .groupBy(hourBucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Funnel conversion over the event stream: users who performed
    * `fromType` and then `toType` strictly later. One aggregation
    * (min ts per step per user, conditional aggregates — no join),
    * then a global rollup.
    */
  def funnel(events: DataFrame, fromType: String, toType: String): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === fromType, col("ts"))).as("first_from"),
        // LAST toType: converted iff ANY toType after the first fromType
        // (min-vs-min would miss users with an earlier pre-entry event)
        max(when(col("event_type") === toType, col("ts"))).as("last_to"))
      .agg(
        count(when(col("first_from").isNotNull, 1)).as("entered"),
        count(when(col("first_from").isNotNull &&
          col("last_to") > col("first_from"), 1)).as("converted"))
      .select(col("entered"), col("converted"),
        (col("converted") * 10000L).cast("double")
          .divide(greatest(col("entered"), lit(1L))).as("conv_bp"))

  /** SCD-2 dimension build from a change log: collapse each user's
    * event stream into validity intervals of the tracked attribute
    * (here event_type) — rows survive only where the attribute CHANGES,
    * each carrying [valid_from, valid_to) with valid_to = the next
    * change (NULL = current) and a 1-based version. The standard
    * effective-dated dimension a warehouse keeps for point-in-time
    * joins (the as-of join surface consumes exactly this shape).
    *
    * Scale shape: all three window passes share ONE (user_id) hash
    * partitioning and one intra-partition sort — a single shuffle
    * keyed on the natural dimension key, never a global sort. State is
    * one row of look-behind per pass (lag/lead), nothing accumulates.
    */
  def scd2(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = events
      .withColumn("__prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
    changes
      .withColumn("__next_ts", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("__next_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        row_number().over(byUser).cast("long").as("version"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Incremental [[scd2]] maintenance: apply a NEW batch of change-log
    * events to an existing effective-dated dimension — the daily-run
    * form. Precondition (the change-data-capture contract): every
    * batch event is later than every event already folded into `dim`
    * for that user.
    *
    * Semantics proven by the oracle: the output hash-matches the full
    * recompute `scd2(all events)` — a batch interval that merely
    * CONTINUES a user's open interval merges into it (no new row),
    * otherwise the open interval closes at the batch's first change
    * and batch versions renumber on top of the user's last version.
    * New users append verbatim.
    *
    * Scale shape: [[scd2]] runs on the BATCH only; the dim joins once
    * on user_id (its open rows are one per user) — the history rows
    * pass through untouched. Nothing rescans the events that built
    * `dim`.
    */
  def scd2Merge(dim: DataFrame, delta: DataFrame): DataFrame = {
    val open = dim.filter(col("valid_to").isNull)
      .select(col("user_id"), col("event_type").as("__cur"),
        col("version").as("__curv"))
    val d = scd2(delta).join(open, Seq("user_id"), "left")
    val continuation = col("version") === 1L && col("event_type") === col("__cur")
    val kept = d.filter(col("__cur").isNull || !continuation)
    val keptAgg = kept.groupBy(col("user_id"))
      .agg(min(col("valid_from")).as("__first_from"))
    val drops = d.filter(continuation)
      .select(col("user_id"), lit(1L).as("__drop1"))
    val history = dim.filter(col("valid_to").isNotNull)
    val openOut = dim.filter(col("valid_to").isNull)
      .join(keptAgg, Seq("user_id"), "left")
      .withColumn("valid_to", col("__first_from"))
      .drop("__first_from")
    val deltaOut = kept
      .join(drops, Seq("user_id"), "left")
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"),
        (col("version") + coalesce(col("__curv"), lit(0L)) -
          coalesce(col("__drop1"), lit(0L))).as("version"))
    history.unionByName(openOut).unionByName(deltaOut)
      .orderBy(col("user_id"), col("version"))
  }

  /** Retention cohorts: users grouped by first-seen week; for each
    * (cohort, weeks-since) cell, how many cohort users were active.
    * Two aggregations over one scan lineage — cohort assignment is a
    * per-user min, then activity re-aggregates by (cohort, offset).
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    events
      .join(firstSeen, Seq("user_id"))
      .withColumn("week_offset",
        floor((unix_timestamp(date_trunc("week", col("ts"))) -
          unix_timestamp(col("cohort_week"))) / 604800L).cast("long"))
      .groupBy(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"))
      .agg(count_distinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** P4 + W1 — latest-N feed with dynamic conjunctive filters
    * (reference app.py:269-285): optional status / operation / table
    * predicates, newest first, limit. TakeOrderedAndProject — no
    * global sort at any scale.
    */
  def latest(activity: DataFrame, n: Int = 50,
             status: Option[String] = None,
             operation: Option[String] = None,
             tableLike: Option[String] = None): DataFrame = {
    val base = Seq(
      status.map(s => col("operation_status") === s),
      operation.map(o => col("operation_type") === o),
      tableLike.map(t => col("table_name").contains(t))
    ).flatten.foldLeft(activity)((df, p) => df.filter(p))
    base
      .orderBy(col("access_timestamp").desc, col("activity_id").desc)
      .limit(n)
      .select(col("activity_id"), col("username"), col("operation_type"),
        col("table_name"), col("operation_status"), col("ip_address"),
        col("access_timestamp"))
  }

  // ------------------------------------------------------------------
  // Mergeable reach sketches (Spark-native DataSketches HLL) — the
  // sketch-surface analog of the mergeable frequency dims: persisted
  // per-group state a daily batch folds into without a corpus rescan.
  // ------------------------------------------------------------------

  /** Per-group DataSketches-HLL reach sketches — the MERGEABLE form of
    * `ev_user_reach_approx`'s one-shot estimate. A daily pipeline
    * persists one (group, sketch) row per group (~KB at lgK 12:
    * 4096 registers, rsd ≈ 1.6%) and each new batch folds in via
    * [[mergeReach]]; the alternative — re-scanning the corpus for
    * every distinct-count refresh — is the 100 TB anti-pattern.
    */
  def reachSketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("reach_sketch"))

  /** Fold a batch's sketches into the persisted ones: a distributive
    * register-max union at equal lgK, so
    * `estimate(mergeReach(sketch(A), sketch(B))) ≡
    * estimate(sketch(A ∪ B))` — merged state answers exactly what a
    * full recompute would (the `ev_reach_merge` contract row locks
    * this equality through both coupon and dense HLL modes).
    */
  def mergeReach(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy(col("event_type"))
      .agg(hll_union_agg(col("reach_sketch")).as("reach_sketch"))

  /** Distinct-count estimates off the (persisted or merged) sketches —
    * no raw-data access. */
  def reachEstimates(sketches: DataFrame): DataFrame =
    sketches.select(col("event_type"),
      hll_sketch_estimate(col("reach_sketch")).as("est_users"))

  /** Whole-stream Count-Min frequency sketch as MERGEABLE persisted
    * state — the point-query dual of [[reachSketches]] on the same
    * daily-pipeline story: persist one ~KB sketch, fold each new
    * batch in with [[mergeCms]], answer per-key frequency estimates
    * without rescanning the corpus. One distributive pass (Spark's
    * `count_min_sketch` aggregate merges partials internally); `n`
    * rides along for the ε·N error-bound arithmetic.
    */
  def cmsSketch(events: DataFrame, keyCol: String = "event_type",
                eps: Double = 0.0005, conf: Double = 0.999,
                seed: Int = 42): DataFrame =
    events.agg(
      count_min_sketch(col(keyCol), lit(eps), lit(conf), lit(seed))
        .as("cms"),
      count(lit(1)).as("n"))

  /** Seeded (lo, hi, country) range dim for the `dam_geo_range`
    * fixture, covering the synthetic activity IP space 10.0.0-49.x
    * with deliberately UNALIGNED boundaries (so prefix blocking is
    * exercised mid-range) and the 10.0.45-49.x tail uncovered
    * (→ 'unknown'). Dotted quads for legibility; both engines derive
    * the integer bounds from these strings.
    */
  val GeoRangeSeed: Seq[(String, String, String)] = Seq(
    ("10.0.0.0", "10.0.9.127", "US"),
    ("10.0.9.128", "10.0.19.255", "DE"),
    ("10.0.20.0", "10.0.34.17", "IN"),
    ("10.0.34.18", "10.0.44.255", "BR"))

  /** [[GeoRangeSeed]] as the (lo, hi, country) integer-bounds frame
    * [[geoRangeLookup]] consumes. */
  def geoRangeDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rows = GeoRangeSeed.map { case (lo, hi, c) => (lo, hi, c) }
    spark.createDataFrame(rows).toDF("lo_ip", "hi_ip", "country")
      .select(ipToLong(col("lo_ip")).as("lo"),
        ipToLong(col("hi_ip")).as("hi"), col("country"))
  }

  /** Dotted-quad IPv4 → uint32 as a long (scan-local; the range-join
    * key for [[geoRangeLookup]]). */
  def ipToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    element_at(p, 1).cast("long") * 16777216L +
      element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L +
      element_at(p, 4).cast("long")
  }

  /** CIDR / range-table geo enrichment — the production form of the
    * reference's per-IP geo dim (C7, app.py:709-731): real deployments
    * ship (lo, hi, country) RANGE tables (GeoLite-style), and a naive
    * range join is a broadcast nested loop over every (row, range)
    * pair. This one is an EQUI-join: each dim range explodes across
    * the /prefixBits blocks it spans (dim-side blowup only, bounded by
    * range width / 2^(32-prefixBits)), the fact side computes its
    * block scan-locally, and the join runs hash-equi on the block id
    * with the lo<=ip<=hi check as a residual filter. The dim stays
    * KB-scale → broadcast → ZERO fact-side shuffle; unmatched rows
    * fall through as null country (callers coalesce to 'unknown').
    *
    * Precondition: ranges must be non-overlapping (an overlap would
    * duplicate fact rows — the spec locks the fan-out contract).
    */
  def geoRangeLookup(logs: DataFrame, ranges: DataFrame,
                     prefixBits: Int = 16): DataFrame = {
    require(prefixBits >= 0 && prefixBits <= 32,
      s"geoRangeLookup: prefixBits must be in [0,32], got $prefixBits")
    val shift = 32 - prefixBits
    val dim = ranges.select(col("lo"), col("hi"), col("country"),
      explode(sequence(shiftright(col("lo"), shift),
        shiftright(col("hi"), shift))).as("pfx"))
    val keyed = logs.withColumn("ip_int", ipToLong(col("ip_address")))
      .withColumn("pfx", shiftright(col("ip_int"), shift))
    keyed.join(broadcast(dim),
        keyed("pfx") === dim("pfx") &&
          keyed("ip_int") >= dim("lo") && keyed("ip_int") <= dim("hi"),
        "left")
      .drop(dim("pfx")).drop("lo", "hi")
  }

  /** Fold one serialized CMS into another. CMS counters are a
    * depth×width matrix of EXACT sums and the hash functions are
    * seed-determined, so merging is element-wise addition and
    * `estimate(mergeCms(cms(A), cms(B)))` is BIT-IDENTICAL to
    * `estimate(cms(A ∪ B))` at equal (eps, conf, seed) — stronger
    * than the HLL contract's estimate equality, and exactly why
    * persisted CMS state never needs a corpus rescan. KB-scale
    * driver-side op, like the frequency dims (`TextOps.mergeDim`).
    */
  def mergeCms(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(a))
    sa.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(b)))
    val bos = new java.io.ByteArrayOutputStream()
    sa.writeTo(bos)
    bos.toByteArray
  }
}
