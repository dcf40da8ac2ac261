package graft

import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Detect

/** C4 severity lattice truth table, C5 alert typing, C6 compliance,
  * J4 firewall first-match (SURVEY §2.7; reference app.py:339-486,
  * 823-850).
  */
class DetectSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkActivity(rows: Seq[(Long, Long, String, String, String,
      String, String, String, Long)]): DataFrame =
    rows.toDF("activity_id", "user_id", "username", "role",
        "operation_type", "table_name", "operation_details", "ip_address",
        "rows_affected")
      .withColumn("access_timestamp",
        // working-hours timestamp unless overridden per-test
        to_timestamp(lit("2024-01-10 12:00:00")) + expr("INTERVAL 1 MINUTE") * col("activity_id"))
      .withColumn("operation_status", lit("Success"))

  private def classify(df: DataFrame): Map[Long, (Long, String, String)] =
    Detect.classify(df, Detect.ipBlacklist(spark))
      .select($"activity_id", $"severity_ord", $"severity_level", $"suspicious_reasons")
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("C4 rules fire with their fixed ordinals") {
    val rows = Seq(
      // blacklisted IP → Critical
      (1L, 1L, "u1", "User", "SELECT", "products", "SELECT 1", "10.0.3.7", 0L),
      // Guest write → High
      (2L, 2L, "u2", "Guest", "DELETE", "products", "DELETE FROM products", "10.0.0.1", 0L),
      // User on sensitive table → Medium
      (3L, 3L, "u3", "User", "SELECT", "accounts", "SELECT 1 FROM accounts", "10.0.0.1", 0L),
      // injection → Critical
      (4L, 4L, "u4", "User", "SELECT", "products", "SELECT * FROM t UNION SELECT secret", "10.0.0.1", 0L),
      // sensitive column → High
      (5L, 5L, "u5", "Admin", "SELECT", "products", "SELECT password FROM t", "10.0.0.1", 0L),
      // large extraction → High
      (6L, 6L, "u6", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 5000L),
      // benign (Admin, working hours, normal table) → Low
      (7L, 7L, "u7", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 1L))
    val got = classify(mkActivity(rows))
    assert(got(1L)._2 == "Critical" && got(1L)._3.contains("blacklisted"))
    assert(got(2L)._2 == "High" && got(2L)._3.contains("Guest"))
    assert(got(3L)._2 == "Medium" && got(3L)._3.contains("sensitive table"))
    assert(got(4L)._2 == "Critical" && got(4L)._3.contains("Injection"))
    assert(got(5L)._2 == "High" && got(5L)._3.contains("Sensitive column"))
    assert(got(6L)._2 == "High" && got(6L)._3.contains("Large extraction"))
    assert(got(7L)._2 == "Low" && got(7L)._3 == "")
  }

  test("C4 severity is max of contributions, not order-dependent") {
    // Guest (High) + sensitive table (Medium) + injection (Critical)
    val rows = Seq(
      (1L, 2L, "u", "Guest", "UPDATE", "accounts",
        "UPDATE accounts SET x=1 WHERE '1'='1' OR 1=1", "10.0.0.1", 0L))
    val got = classify(mkActivity(rows))
    assert(got(1L)._1 == 3L && got(1L)._2 == "Critical")
    val reasons = got(1L)._3
    assert(reasons.contains("Guest") && reasons.contains("Injection"))
  }

  test("C4 off-hours rule respects working-hours boundaries [9,18)") {
    val base = Seq((0L, 1L, "u", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 0L))
    def at(hour: Int): DataFrame =
      mkActivity(base).withColumn("access_timestamp",
        to_timestamp(lit(f"2024-01-10 $hour%02d:30:00")))
    assert(classify(at(8))(0L)._2 == "Medium")
    assert(classify(at(9))(0L)._2 == "Low")
    assert(classify(at(17))(0L)._2 == "Low")
    assert(classify(at(18))(0L)._2 == "Medium")
  }

  test("C4 rate-limit rule: over-threshold minute flags Medium") {
    // 6 events for user 1 inside one minute, threshold 5
    val rows = (1L to 6L).map(i =>
      (i, 1L, "u1", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 0L)) ++
      Seq((7L, 2L, "u2", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 0L))
    val df = mkActivity(rows).withColumn("access_timestamp",
      to_timestamp(lit("2024-01-10 12:00:05")))
    val got = Detect.classify(df, Detect.ipBlacklist(spark), rateThreshold = 5)
      .select($"activity_id", $"severity_level").as[(Long, String)].collect().toMap
    assert(got(1L) == "Medium")
    assert(got(7L) == "Low")
  }

  test("C5 alert typing: first match over reasons") {
    val rows = Seq(
      (1L, 1L, "u", "User", "SELECT", "products", "SELECT * FROM t UNION SELECT 1", "10.0.0.1", 0L),
      (2L, 1L, "u", "Admin", "SELECT", "products", "SELECT salary FROM t", "10.0.0.1", 0L),
      (3L, 2L, "u2", "Guest", "DROP", "products", "DROP products", "10.0.0.1", 0L),
      (4L, 1L, "u", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 0L))
    val alerts = Detect.deriveAlerts(
      Detect.classify(mkActivity(rows), Detect.ipBlacklist(spark)))
      .select($"activity_id", $"alert_type").as[(Long, String)].collect().toMap
    assert(alerts(1L) == "SQL Injection")
    assert(alerts(2L) == "Data Leakage")
    assert(alerts(3L) == "Security Violation")
    assert(!alerts.contains(4L)) // Low severity → no alert
  }

  test("C6 compliance findings per rule branch") {
    val rows = Seq(
      (1L, 1L, "u", "User", "SELECT", "users", "SELECT * FROM users", "ip", 0L),
      (2L, 1L, "u", "User", "UPDATE", "accounts", "UPDATE accounts", "ip", 5L),
      (3L, 1L, "u", "User", "DELETE", "accounts", "DELETE FROM accounts", "ip", 0L),
      (4L, 1L, "u", "User", "SELECT", "payments", "SELECT 1 FROM payments", "ip", 0L),
      (5L, 1L, "u", "User", "SELECT", "products", "SELECT 1", "ip", 0L))
    val got = Detect.complianceFindings(mkActivity(rows))
      .select($"activity_id", $"standard", $"status")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "GDPR", "Non-compliant"),
      (2L, "SOX", "Compliant"),
      (3L, "SOX", "Review needed"),
      (4L, "PCI_DSS", "Monitored")))
  }

  test("J4+W3 firewall: priority first-match wins; regex/starts_with dispatch") {
    val rows = Seq(
      // matches rule 1 (union select) and rule 8 (^select *) → rule 1 by priority
      (1L, 1L, "u", "User", "SELECT", "t", "select * from t union select password", "ip", 0L),
      // matches only rule 8 (regex ^select \*)
      (2L, 1L, "u", "User", "SELECT", "t", "SELECT * FROM t", "ip", 0L),
      // starts_with rule 7
      (3L, 1L, "u", "User", "DELETE", "sessions", "DELETE FROM sessions WHERE 1=0", "ip", 0L),
      // no match
      (4L, 1L, "u", "User", "SELECT", "t", "with x as (select 1) select 2", "ip", 0L))
    val got = Detect.firewallMatch(mkActivity(rows), Detect.firewallRules(spark))
      .select($"activity_id", $"rule_id").as[(Long, Int)].collect().toMap
    assert(got(1L) == 1)
    assert(got(2L) == 8)
    assert(got(3L) == 7)
    assert(!got.contains(4L))
  }

  test("J4 firewall honors is_active, scoping, case parity, priority ties") {
    val rows = Seq(
      // user_7 delete: scoped mixed-case rule 9 (priority 5, pattern
      // must be lower-cased to match) beats unscoped rule 7
      (1L, 7L, "user_7", "User", "DELETE", "sessions", "delete from sessions where token = 'x'", "10.0.0.9", 0L),
      // other user's delete: the scope guard keeps rule 9 out
      (2L, 8L, "user_8", "User", "DELETE", "sessions", "delete from sessions where token = 'x'", "10.0.0.9", 0L),
      // user_7 'select *': rules 8 and 10 tie at priority 8 → rule_id
      (3L, 7L, "user_7", "User", "SELECT", "t", "select * from t", "10.0.0.9", 0L),
      // user_7 plain select: only scoped rule 10 matches
      (4L, 7L, "user_7", "User", "SELECT", "t", "select id from t", "10.0.0.9", 0L),
      // blacklisted-IP select: ip-scoped rule 11 (priority 6) wins
      (5L, 9L, "user_9", "User", "SELECT", "t", "select name, price from t", "10.0.11.42", 0L),
      // upper-case regex rule 13 only matches because of IGNORECASE
      (6L, 9L, "user_9", "User", "SELECT", "t", "SELECT name FROM t", "10.0.0.9", 0L),
      // plain select, unscoped IP/user: only the INACTIVE rule 12
      // pattern-matches → no match at all
      (7L, 9L, "user_9", "User", "SELECT", "t", "select id from t", "10.0.0.9", 0L))
    val got = Detect.firewallMatch(mkActivity(rows), Detect.firewallRules(spark))
      .select($"activity_id", $"rule_id", $"action").as[(Long, Int, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((9, "block")))
    assert(got(2L) == ((7, "alert")))
    assert(got(3L)._1 == 8)
    assert(got(4L)._1 == 10)
    assert(got(5L) == ((11, "block")))
    assert(got(6L)._1 == 13)
    assert(!got.contains(7L))
  }

  test("firewallCheck: one-off statement check returns the first match") {
    val rules = Detect.firewallRules(spark)
    assert(Detect.firewallCheck(spark,
      "SELECT * FROM t UNION SELECT password", "u", "10.0.0.1", rules)
      .contains((1, "block", "SQL Injection - UNION")))
    assert(Detect.firewallCheck(spark,
      "with x as (select 1) select 2", "u", "10.0.0.1", rules).isEmpty)
  }

  test("blacklist temporal validity: expired entries never flag") {
    val rows = Seq(
      (1L, 1L, "u1", "User", "SELECT", "products", "SELECT 1", "10.0.3.7", 0L),
      (2L, 2L, "u2", "User", "SELECT", "products", "SELECT 1", "10.0.0.101", 0L))
    val got = classify(mkActivity(rows))
    assert(got(1L)._2 == "Critical" && got(1L)._3.contains("blacklisted"))
    assert(got(2L)._2 == "Low" && got(2L)._3 == "")
    // a blacklist without expires_at passes through unfiltered
    val bare = Seq(("10.0.0.101", "r")).toDF("ip_address", "reason")
    val got2 = Detect.classify(mkActivity(rows), bare)
      .select($"activity_id", $"severity_level").as[(Long, String)]
      .collect().toMap
    assert(got2(2L) == "Critical")
  }

  test("C4 rate rule counts null-key rows as one group (window parity)") {
    // 4 events in one minute from a null user_id — with threshold 3 the
    // rate rule must fire for them, as the window formulation did
    val rows = (1 to 4).map(i => (i.toLong, "SELECT 1")) :+ ((5L, "SELECT 2"))
    val df = rows.toDF("activity_id", "operation_details")
      .withColumn("user_id",
        when(col("activity_id") === 5L, 7L).otherwise(lit(null).cast("long")))
      .withColumn("username", lit("u"))
      .withColumn("role", lit("Admin"))
      .withColumn("operation_type", lit("SELECT"))
      .withColumn("table_name", lit("products"))
      .withColumn("ip_address", lit("10.0.0.1"))
      .withColumn("rows_affected", lit(0L))
      .withColumn("operation_status", lit("Success"))
      .withColumn("access_timestamp", to_timestamp(lit("2024-01-10 12:00:10")))
    val got = Detect.classify(df, Detect.ipBlacklist(spark), rateThreshold = 3)
      .select($"activity_id", $"suspicious_reasons")
      .as[(Long, String)].collect().toMap
    (1L to 4L).foreach(i =>
      assert(got(i).contains("Rate limit"), s"null-key row $i missed"))
    assert(!got(5L).contains("Rate limit"))
  }

  private def mkStatusSeq(statuses: Seq[String]): org.apache.spark.sql.DataFrame =
    statuses.zipWithIndex.map { case (st, i) => (i.toLong + 1, st) }
      .toDF("activity_id", "operation_status")
      .withColumn("username", lit("u"))
      .withColumn("access_timestamp",
        to_timestamp(lit("2024-01-10 12:00:00")) +
          expr("INTERVAL 1 MINUTE") * col("activity_id"))

  test("lockouts: counter resets on success, fires once per streak crossing") {
    // F F S F F F F S F F F — with maxAttempts=3 the counter reaches 3
    // exactly at ids 6 (second streak) and 11 (third streak)
    val df = mkStatusSeq(Seq("Failed", "Failed", "Success", "Failed",
      "Failed", "Failed", "Failed", "Success", "Failed", "Failed", "Failed"))
    val got = Detect.lockouts(df, maxAttempts = 3, lockoutMinutes = 30)
      .select($"activity_id", $"failed_attempts",
        unix_timestamp($"locked_until") - unix_timestamp($"locked_at"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((6L, 3L, 1800L), (11L, 3L, 1800L)))
  }

  test("lockouts: a 4th consecutive failure does not re-fire") {
    val df = mkStatusSeq(Seq("Failed", "Failed", "Failed", "Failed"))
    val ids = Detect.lockouts(df, maxAttempts = 3)
      .select($"activity_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
  }

  test("failedHourly: per-hour failed counts above threshold only") {
    val rows = Seq(
      (1L, "u1", "Failed", "2024-01-10 12:05:00"),
      (2L, "u1", "Failed", "2024-01-10 12:25:00"),
      (3L, "u1", "Failed", "2024-01-10 12:45:00"),
      (4L, "u1", "Failed", "2024-01-10 13:05:00"),
      (5L, "u1", "Success", "2024-01-10 12:50:00"),
      (6L, "u2", "Failed", "2024-01-10 12:10:00"))
      .toDF("activity_id", "username", "operation_status", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    val got = Detect.failedHourly(rows, threshold = 2)
      .select($"username", date_format($"hour_bucket", "HH:00"), $"n_failed")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("u1", "12:00", 3L)))
  }

  test("edge cases: empty inputs yield empty outputs, not errors") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("activity_id", "username", "operation_status")
      .withColumn("access_timestamp",
        to_timestamp(lit("2024-01-10 00:00:00")))
      .filter(lit(false))
    assert(Detect.lockouts(empty).count() == 0)
    assert(Detect.failedHourly(empty).count() == 0)
    assert(Detect.periodFilter(
      empty.withColumn("table_name", lit("t"))
        .withColumn("operation_type", lit("SELECT"))
        .withColumn("rows_affected", lit(0L)), "daily").count() == 0)
  }

  test("periodFilter anchors at max ts: daily=calendar day, weekly/monthly trailing") {
    val rows = Seq(
      (1L, "2024-02-15 10:00:00"), // the anchor (max ts)
      (2L, "2024-02-15 01:00:00"), // same calendar day
      (3L, "2024-02-13 09:00:00"), // within 7 days
      (4L, "2024-02-01 09:00:00"), // within 30 days
      (5L, "2023-12-25 09:00:00")) // outside all windows
      .toDF("activity_id", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    def ids(p: String) = Detect.periodFilter(rows, p)
      .select($"activity_id").as[Long].collect().toSet
    assert(ids("daily") == Set(1L, 2L))
    assert(ids("weekly") == Set(1L, 2L, 3L))
    assert(ids("monthly") == Set(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException](Detect.periodFilter(rows, "hourly"))
  }
}
