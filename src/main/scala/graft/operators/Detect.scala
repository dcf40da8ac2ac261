package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's threat-detection rule engines (SURVEY §2.7 C4-C8)
  * as declarative Column pipelines over the activity view.
  *
  * Scale design: every rule is a per-row expression (codegen'd, no
  * shuffle); the only non-local pieces are
  *  - the blacklist semi-join (J3) — tiny dim, always broadcast;
  *  - the firewall rule match (J4) — broadcast nested-loop join
  *    against a handful of rules, then first-match-by-priority via a
  *    map-side-combinable min_by aggregate on the unique activity_id
  *    (W3): partial aggregation collapses the join output to one row
  *    per activity before any exchange, so the shuffle carries one
  *    narrow row per matched activity instead of rows × matched rules.
  *  - the rate-limit rule (C4 rule 8) — per-(user, minute) counts are
  *    pre-aggregated (the shuffle carries keys + a long, not full
  *    rows) and joined back; AQE broadcasts the count side when small.
  */
object Detect {

  /** Severity ordinal lattice (reference app.py severity levels):
    * Low=0, Medium=1, High=2, Critical=3.
    */
  val SeverityNames: Seq[String] = Seq("Low", "Medium", "High", "Critical")
  def severityName(ordinal: Column): Column =
    when(ordinal >= 3, "Critical")
      .when(ordinal === 2, "High")
      .when(ordinal === 1, "Medium")
      .otherwise("Low")

  /** Sensitive tables / columns (reference app.py:82-83). */
  val SensitiveTables: Seq[String] =
    Seq("users", "customers", "accounts", "payments", "credit_cards")
  val SensitiveColumns: Seq[String] =
    Seq("password", "ssn", "credit", "salary", "email")

  /** SQL-injection signatures (reference app.py:86-102, condensed to
    * patterns valid in both Java regex and RE2 so the oracle agrees).
    */
  val InjectionPatterns: Seq[String] = Seq(
    "(?i)union\\s+select", "(?i)or\\s+1\\s*=\\s*1", "(?i)'\\s*or\\s*'1'\\s*=\\s*'1",
    "(?i);\\s*--", "(?i)drop\\s+table", "(?i)into\\s+outfile",
    "(?i)xp_cmdshell", "(?i)sleep\\s*\\(", "(?i)benchmark\\s*\\(",
    "(?i)load_file\\s*\\(")

  /** The injection battery fused into ONE compiled alternation (same
    * trick as [[graft.functions.Classify.SkipPattern]]): a single
    * regexp pass per row instead of ten. Valid in both Java regex and
    * RE2, so the oracle evaluates the identical pattern.
    */
  val InjectionAlternation: String =
    InjectionPatterns.map(_.stripPrefix("(?i)"))
      .mkString("(?i)(?:", "|", ")")

  /** Static IP blacklist seed (reference ip_blacklist table,
    * sql/02_create_tables.sql:69-77; loaded with temporal validity
    * `expires_at > NOW()` at app.py:332-337): (ip, reason,
    * expires_at), the single source for both the Spark dim and the
    * DuckDB oracle VALUES (SparkEntry generates its SQL from this
    * seq, so the two can never drift). Stand-in fixture rows over the
    * synthesized IP space of [[graft.sources.Tables.activity]]; the
    * last entry is EXPIRED and must never flag ([[activeBlacklist]]
    * filters it).
    */
  val BlacklistSeed: Seq[(String, String, String)] = Seq(
    ("10.0.3.7", "known scanner", "2100-01-01 00:00:00"),
    ("10.0.11.42", "credential stuffing", "2100-01-01 00:00:00"),
    ("10.0.21.100", "tor exit", "2100-01-01 00:00:00"),
    ("10.0.33.13", "abuse report", "2100-01-01 00:00:00"),
    ("10.0.47.200", "manual block", "2100-01-01 00:00:00"),
    ("10.0.0.101", "expired probation block", "2000-01-01 00:00:00"))

  def ipBlacklist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    BlacklistSeed.toDF("ip_address", "reason", "expires_at")
      .withColumn("expires_at", col("expires_at").cast("timestamp_ntz"))
  }

  /** Temporal-validity filter for the blacklist (reference app.py:334:
    * `WHERE expires_at > NOW()`): batch data has no wall clock, so the
    * anchor is the newest activity timestamp — the same max-ts
    * anchoring as [[periodFilter]], via a 1-row broadcast cross-join
    * (no driver collect). A blacklist without an `expires_at` column
    * passes through unfiltered (never-expiring entries).
    */
  def activeBlacklist(activity: DataFrame, blacklist: DataFrame): DataFrame =
    if (!blacklist.columns.contains("expires_at")) blacklist
    else {
      val tsType = activity.schema("access_timestamp").dataType
      val anchor = broadcast(
        activity.agg(max(col("access_timestamp")).as("__bl_anchor")))
      blacklist.crossJoin(anchor)
        .filter(col("expires_at").cast(tsType) > col("__bl_anchor"))
        .drop("__bl_anchor")
    }

  /** Firewall rule seed (reference firewall_rules DDL
    * app.py:1474-1488, seeds app.py:1529-1541): (rule_id, pattern,
    * description, match_type, action, priority, applies_to_user,
    * applies_to_ip, is_active) — single source for the Spark dim AND
    * the DuckDB oracle VALUES (SparkEntry generates its SQL from this
    * seq). Rules 9-13 exercise the scoping / case-parity / is_active /
    * priority-tie semantics the reference matcher honors
    * (app.py:826-841).
    */
  val FirewallRuleSeed: Seq[(Int, String, String, String, String, Int,
      Option[String], Option[String], Boolean)] = {
    val none: Option[String] = None
    Seq(
      (1, "union select", "SQL Injection - UNION", "contains", "block", 1, none, none, true),
      (2, "drop table", "Destructive DROP TABLE", "contains", "block", 2, none, none, true),
      (3, "into outfile", "File write via SELECT", "contains", "block", 3, none, none, true),
      (4, "xp_", "SQL Server xp_ procedure", "contains", "block", 4, none, none, true),
      (5, "sleep(", "Time-based blind injection", "contains", "block", 5, none, none, true),
      (6, "or 1=1", "Classic boolean injection", "contains", "block", 6, none, none, true),
      (7, "delete from sessions", "Session table delete", "starts_with", "alert", 7, none, none, true),
      (8, "^select \\*", "Full-row SELECT *", "regex", "alert", 8, none, none, true),
      // scoped + mixed-case pattern: beats rule 7 for user_7 only, and
      // only matches at all because contains lower-cases the PATTERN
      (9, "DELETE FROM sessions", "Scoped session-delete block", "contains", "block", 5, Some("user_7"), none, true),
      // priority tie with rule 8 → rule_id breaks the tie (app.py:826
      // ORDER BY priority ASC is insertion-stable within a priority)
      (10, "select", "Scoped select monitor", "contains", "alert", 8, Some("user_7"), none, true),
      (11, "select", "Blacklisted-IP select block", "contains", "block", 6, none, Some("10.0.11.42"), true),
      // inactive: must never fire despite matching nearly everything
      (12, "select", "Disabled legacy block", "contains", "block", 0, none, none, false),
      // upper-case regex over lower-cased text: only matches because
      // regex match is case-insensitive (re.IGNORECASE, app.py:841)
      (13, "^SELECT name", "Named-column select monitor", "regex", "alert", 9, none, none, true))
  }

  def firewallRules(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FirewallRuleSeed
      .toDF("rule_id", "pattern", "description", "match_type", "action",
        "priority", "applies_to_user", "applies_to_ip", "is_active")
  }

  /** C4 — the severity lattice. Takes the activity view (must carry
    * role, operation_type, table_name, operation_details, ip_address,
    * access_timestamp, rows_affected, user_id) and returns it with
    * is_suspicious / suspicious_reasons / severity_level / severity_ord.
    *
    * Reference rules app.py:339-411; the "raise only if currently Low"
    * caps are equivalent to greatest() over fixed per-rule ordinals
    * (each rule's contribution is a constant — SURVEY §7 equivalence).
    * Rate-limit rule (app.py:396-403, >100 events/min) is evaluated as
    * a per-(user, minute) windowed count, threshold parameterized.
    */
  def classify(activity: DataFrame, blacklist: DataFrame,
               rateThreshold: Int = 100,
               rateKey: String = "user_id"): DataFrame = {
    val bl = broadcast(activeBlacklist(activity, blacklist)
      .select(col("ip_address"), lit(true).as("is_blacklisted")))
    val withBl = activity.join(bl, Seq("ip_address"), "left")

    // per-(rateKey, minute) counts: pre-aggregated off the raw activity
    // (shuffles just the two keys and a long — a window over the full
    // rows would shuffle every column by (user, minute)), then joined
    // back NULL-SAFELY: the window this replaces counted null-key rows
    // as one group, so the join must too (a plain equi-join would
    // silently disable the rate rule for null keys)
    val minuteExpr = date_trunc("minute", col("access_timestamp"))
    val rates = activity
      .groupBy(col(rateKey).as("__rk"), minuteExpr.as("__rm"))
      .agg(count(lit(1)).as("events_per_minute"))

    val op = col("operation_type")
    val sql = col("operation_details")
    val writeOps = Seq("INSERT", "UPDATE", "DELETE", "DROP", "ALTER")
    val hr = hour(col("access_timestamp"))

    val r1 = coalesce(col("is_blacklisted"), lit(false))
    val r2 = col("role") === "Guest" && op.isin(writeOps: _*)
    val r3 = col("role") === "User" &&
      col("table_name").isin(SensitiveTables: _*) &&
      op.isin("SELECT", "INSERT", "UPDATE")
    val r4 = hr < 9 || hr >= 18
    val r5 = sql.rlike(InjectionAlternation)
    val r6 = SensitiveColumns.map(c => lower(sql).contains(c)).reduce(_ || _)
    val r7 = coalesce(col("rows_affected"), lit(0L)) > 1000L
    val r8 = col("events_per_minute") > rateThreshold

    val rules: Seq[(Column, Int, String)] = Seq(
      (r1, 3, "IP address blacklisted"),
      (r2, 2, "Guest role write operation"),
      (r3, 1, "User access to sensitive table"),
      (r4, 1, "Off-hours access"),
      (r5, 3, "SQL Injection pattern"),
      (r6, 2, "Sensitive column access"),
      (r7, 2, "Large extraction"),
      (r8, 1, "Rate limit exceeded"))

    val ord = greatest(lit(0) +: rules.map { case (c, o, _) =>
      when(c, lit(o)).otherwise(lit(0)) }: _*)
    val reasons = concat_ws("; ", rules.map { case (c, _, r) =>
      when(c, lit(r)) }: _*)

    withBl
      .withColumn("__rate_key", col(rateKey))
      .withColumn("__rate_minute", minuteExpr)
      .join(rates, col("__rate_key") <=> col("__rk") &&
        col("__rate_minute") <=> col("__rm"), "left")
      .drop("__rate_key", "__rate_minute", "__rk", "__rm")
      .withColumn("severity_ord", ord.cast("long"))
      .withColumn("severity_level", severityName(ord))
      .withColumn("suspicious_reasons", reasons)
      .withColumn("is_suspicious", ord > 0)
      .drop("is_blacklisted")
  }

  /** C5 — alert derivation (reference app.py:410-433): only
    * High/Critical activities raise alerts; alert_type is the first
    * match over the joined reason string.
    */
  def deriveAlerts(classified: DataFrame): DataFrame = {
    val reasons = col("suspicious_reasons")
    classified
      .filter(col("severity_ord") >= 2)
      .withColumn("alert_type",
        when(reasons.contains("SQL Injection"), "SQL Injection")
          .when(reasons.contains("Sensitive"), "Data Leakage")
          .when(reasons.contains("Rate limit"), "DoS Attempt")
          .otherwise("Security Violation"))
      .withColumn("alert_status", lit("New"))
  }

  /** C6 — compliance classifier (reference app.py:468-486): per
    * activity, zero..three findings (GDPR / SOX / PCI_DSS), exploded
    * into a findings stream. Generator-shaped (explode) per SURVEY
    * §2.7; no shuffle — explode runs inside the scan stage.
    */
  def complianceFindings(activity: DataFrame): DataFrame = {
    val tbl = col("table_name")
    val op = col("operation_type")
    val gdpr = when(tbl === "users" && op === "SELECT",
      struct(lit("GDPR").as("standard"),
        lit("PII read access").as("finding"),
        lit("Non-compliant").as("status")))
    val sox = when(tbl === "accounts" && op.isin("UPDATE", "DELETE"),
      struct(lit("SOX").as("standard"),
        lit("Financial data modification").as("finding"),
        when(coalesce(col("rows_affected"), lit(0L)) > 0L, "Compliant")
          .otherwise("Review needed").as("status")))
    val pci = when(tbl.isin("payments", "sessions"),
      struct(lit("PCI_DSS").as("standard"),
        lit("Cardholder data environment touched").as("finding"),
        lit("Monitored").as("status")))
    activity
      .withColumn("f", explode(array_compact(array(gdpr, sox, pci))))
      .select(col("activity_id"), col("username"),
        col("f.standard").as("standard"), col("f.finding").as("finding"),
        col("f.status").as("status"))
  }

  /** Anchored period filter for report windows (reference
    * app.py:489-495; cron cadences app.py:878-882): "daily" keeps the
    * calendar day of the newest activity (the CURDATE analog — batch
    * data has no wall clock), "weekly"/"monthly" keep the trailing
    * 7/30 days from the max timestamp. The anchor is a 1-row broadcast
    * cross-join (no driver collect), so the filter still pushes into
    * the scan stage and prunes date partitions where present.
    */
  def periodFilter(activity: DataFrame, period: String): DataFrame = {
    val anchor = broadcast(
      activity.agg(max(col("access_timestamp")).as("__anchor")))
    val keep = period match {
      case "daily" =>
        to_date(col("access_timestamp")) === to_date(col("__anchor"))
      case "weekly" =>
        col("access_timestamp") >= col("__anchor") - expr("INTERVAL 7 DAYS")
      case "monthly" =>
        col("access_timestamp") >= col("__anchor") - expr("INTERVAL 30 DAYS")
      case other =>
        throw new IllegalArgumentException(s"unknown report period: $other")
    }
    activity.crossJoin(anchor).filter(keep).drop("__anchor")
  }

  /** Period-windowed compliance report (reference generate_report,
    * app.py:489-509): findings over the daily/weekly/monthly window,
    * summarized per standard/status — the statistics block the
    * scheduled reporter emails and renders to PDF.
    */
  def complianceReport(activity: DataFrame, period: String): DataFrame =
    complianceFindings(periodFilter(activity, period))
      .groupBy(col("standard"), col("status"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("username")).as("distinct_users"))
      .orderBy(col("standard"), col("status"))

  /** Failed-login lockout analytics (reference app.py:80-81
    * MAX_LOGIN_ATTEMPTS=5 / LOCKOUT_DURATION=30 min; authenticate
    * app.py:205-221 resets failed_attempts on success and refuses
    * logins while locked_until is in the future). Batch analog over
    * the activity stream: per user, the consecutive-failure counter
    * since the last success; the row where it reaches `maxAttempts`
    * emits a lockout with locked_until = ts + lockoutMinutes.
    *
    * Plan shape: both running windows share one (username) partition
    * and ordering, so there is exactly ONE shuffle (keyed by user —
    * key-parallel at any scale) and the two WindowExecs pipeline with
    * no second exchange. The counter is running-failed-count minus its
    * value at the most recent success (gaps-and-islands without a
    * second partition key).
    */
  def lockouts(activity: DataFrame, maxAttempts: Int = 5,
               lockoutMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("username"))
      .orderBy(col("access_timestamp"), col("activity_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runFailed =
      sum(when(col("operation_status") === "Failed", 1L).otherwise(0L))
        .over(byUser)
    activity
      .select(col("username"), col("activity_id"), col("operation_status"),
        col("access_timestamp"))
      .withColumn("__run_failed", runFailed)
      .withColumn("__at_success",
        last(when(col("operation_status") === "Success", col("__run_failed")),
          ignoreNulls = true).over(byUser))
      .withColumn("failed_attempts",
        col("__run_failed") - coalesce(col("__at_success"), lit(0L)))
      .filter(col("operation_status") === "Failed" &&
        col("failed_attempts") === maxAttempts)
      .select(col("username"), col("activity_id"),
        col("access_timestamp").as("locked_at"), col("failed_attempts"),
        (col("access_timestamp") + expr(s"INTERVAL $lockoutMinutes MINUTES"))
          .as("locked_until"))
  }

  /** The RATE_LIMIT.max_failed_per_hour feed (reference app.py:107):
    * users whose failed-operation count within an hour bucket exceeds
    * the threshold. Plain hash aggregate — partial combine map-side,
    * the shuffle carries (user, hour, long).
    */
  def failedHourly(activity: DataFrame, threshold: Int = 10): DataFrame =
    activity.filter(col("operation_status") === "Failed")
      .groupBy(col("username"),
        date_trunc("hour", col("access_timestamp")).as("hour_bucket"))
      .agg(count(lit(1)).as("n_failed"))
      .filter(col("n_failed") > threshold)
      .orderBy(col("username"), col("hour_bucket"))

  /** J4 + W3 — firewall matcher (reference app.py:823-850): every
    * activity matched against the ACTIVE rules (`is_active=1`,
    * app.py:826), honoring per-rule `applies_to_user` /
    * `applies_to_ip` guards (empty string = unscoped, matching the
    * reference's falsy check, app.py:833-835). Matching is
    * case-insensitive on BOTH sides: the text is lower-cased and so is
    * the pattern for contains/starts_with (`pat.lower()`,
    * app.py:838-840); regex match carries re.IGNORECASE (app.py:841).
    * First match wins in (priority, rule_id) order — the reference
    * iterates `ORDER BY priority ASC` over rows inserted in rule_id
    * order, so ties within a priority resolve to the lowest rule_id.
    *
    * Broadcast nested-loop join; dedup to first match via a
    * min_by aggregate on the unique activity_id (no window shuffle —
    * partial aggregation collapses to one row per activity map-side).
    */
  /** One-off interactive check (POST /api/v2/firewall/check,
    * app.py:1305-1308 → QueryFirewall.check): the same matcher over a
    * single statement, driver-side. Returns the first-match
    * (rule_id, action, description) or None when nothing fires.
    */
  def firewallCheck(spark: SparkSession, query: String, username: String,
                    ip: String, rules: DataFrame): Option[(Int, String, String)] = {
    import spark.implicits._
    val one = Seq((1L, username, query, ip))
      .toDF("activity_id", "username", "operation_details", "ip_address")
      .withColumn("access_timestamp", current_timestamp())
    firewallMatch(one, rules)
      .select(col("rule_id"), col("action"), col("description"))
      .as[(Int, String, String)].collect().headOption
  }

  def firewallMatch(activity: DataFrame, rules: DataFrame): DataFrame = {
    val txt = lower(col("operation_details"))
    // regexp only ever sees a valid pattern: non-regex rules substitute
    // the never-matching 'a^' (vectorized engines may evaluate the
    // regexp branch even when match_type guards it — same guard in the
    // DuckDB oracle)
    val safePat = when(col("match_type") === "regex",
      concat(lit("(?i)"), col("pattern"))).otherwise(lit("a^"))
    val scopeOk =
      (nullif(col("applies_to_user"), lit("")).isNull ||
        col("applies_to_user") === col("username")) &&
      (nullif(col("applies_to_ip"), lit("")).isNull ||
        col("applies_to_ip") === col("ip_address"))
    val matchPred = scopeOk && (
      (col("match_type") === "contains" && txt.contains(lower(col("pattern")))) ||
      (col("match_type") === "starts_with" && txt.startsWith(lower(col("pattern")))) ||
      (col("match_type") === "regex" && regexp_like(txt, safePat)))
    val hits = activity.join(broadcast(rules.filter(col("is_active"))),
      matchPred, "inner")
    // first match by (priority, rule_id) as a min_by aggregate: partial
    // aggregation collapses to one row per activity map-side
    // (activity_id is unique, so the post-shuffle side is already
    // minimal); a window would instead shuffle the entire join output
    hits
      .groupBy(col("activity_id"))
      .agg(min_by(
        struct(col("username"), col("ip_address"), col("rule_id"),
          col("description"), col("action"), col("priority"),
          substring(col("operation_details"), 1, 500).as("query_snippet"),
          col("access_timestamp").as("matched_at")),
        struct(col("priority"), col("rule_id"))).as("__m"))
      .select(col("activity_id"), col("__m.username").as("username"),
        col("__m.ip_address").as("ip_address"), col("__m.rule_id").as("rule_id"),
        col("__m.description").as("description"),
        col("__m.action").as("action"), col("__m.priority").as("priority"),
        col("__m.query_snippet").as("query_snippet"),
        col("__m.matched_at").as("matched_at"))
  }
}
