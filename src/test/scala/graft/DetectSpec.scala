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

  test("C4 rules fire with the reference severities and reason strings") {
    val rows = Seq(
      // blacklisted IP → Critical
      (1L, 1L, "u1", "User", "SELECT", "products", "SELECT 1", "10.0.3.7", 0L),
      // Guest write → High
      (2L, 2L, "u2", "Guest", "DELETE", "products", "DELETE FROM products", "10.0.0.1", 0L),
      // User on sensitive table → Medium, table name interpolated
      (3L, 3L, "u3", "User", "SELECT", "accounts", "SELECT 1 FROM accounts", "10.0.0.1", 0L),
      // injection → Critical, per-pattern label
      (4L, 4L, "u4", "User", "SELECT", "products", "SELECT * FROM t UNION SELECT secret", "10.0.0.1", 0L),
      // sensitive column → High, column name interpolated
      (5L, 5L, "u5", "Admin", "SELECT", "products", "SELECT password FROM t", "10.0.0.1", 0L),
      // large extraction → High, count interpolated (app.py:389-393)
      (6L, 6L, "u6", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 5000L),
      // benign (Admin, working hours, normal table) → Low, NULL reasons
      (7L, 7L, "u7", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 1L))
    val got = classify(mkActivity(rows))
    assert(got(1L)._2 == "Critical" && got(1L)._3 == "IP address is blacklisted")
    assert(got(2L)._2 == "High" && got(2L)._3 == "Guest attempting write operation")
    assert(got(3L)._2 == "Medium" &&
      got(3L)._3 == "User accessing sensitive table: accounts")
    assert(got(4L)._2 == "Critical" &&
      got(4L)._3 == "Suspicious pattern: SQL Injection - UNION")
    assert(got(5L)._2 == "High" &&
      got(5L)._3 == "Access to sensitive column: password")
    assert(got(6L)._2 == "High" &&
      got(6L)._3 == "Large data extraction: 5000 rows")
    assert(got(7L)._2 == "Low" && got(7L)._3 == null)
  }

  test("C4 severity chain ≡ the reference's sequential fold on all 256 combos") {
    // the Python loop from app.py:339-403, verbatim
    def sequential(r: Int => Boolean): Int = {
      var sev = 0
      if (r(1)) sev = 3                 // blacklist assigns Critical
      if (r(2)) sev = 2                 // guest-write ASSIGNS High
      if (r(3) && sev == 0) sev = 1
      if (r(4) && sev == 0) sev = 1
      if (r(5)) sev = 3                 // injection assigns Critical
      if (r(6) && sev != 3) sev = 2
      if (r(7) && sev == 0) sev = 2
      if (r(8) && sev == 0) sev = 1
      sev
    }
    val rows = (0 until 256).map { m =>
      (m.toLong, (m & 1) != 0, (m & 2) != 0, (m & 4) != 0, (m & 8) != 0,
        (m & 16) != 0, (m & 32) != 0, (m & 64) != 0, (m & 128) != 0,
        sequential(i => (m & (1 << (i - 1))) != 0).toLong)
    }.toDF("mask", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8", "expected")
    val bad = rows.withColumn("got", Detect.severityOrdinal(
        $"b1", $"b2", $"b3", $"b4", $"b5", $"b6", $"b7", $"b8").cast("long"))
      .filter($"got" =!= $"expected")
      .select($"mask", $"expected", $"got").as[(Long, Long, Long)].collect()
    assert(bad.isEmpty, s"flat form diverges from sequential fold: ${bad.toSeq}")
  }

  test("C4 sequential (non-lattice) interactions match the reference") {
    val rows = Seq(
      // off-hours (Medium) + rows>1000: large-extraction fires only
      // from Low (app.py:390-391) → stays Medium, NOT High
      (1L, 1L, "u", "Admin", "SELECT", "products", "SELECT 1", "10.0.0.1", 5000L),
      // blacklisted (Critical) + Guest write: rule 2 ASSIGNS High
      // (app.py:357-358) → the Critical is DOWNGRADED to High
      (2L, 2L, "u2", "Guest", "DELETE", "products", "DELETE FROM products", "10.0.3.7", 0L),
      // ... but blacklisted + injection stays Critical (step 5 re-assigns)
      (3L, 3L, "u3", "Guest", "DELETE", "products", "DELETE FROM x; DROP TABLE x", "10.0.3.7", 0L))
    val offHours = mkActivity(rows).withColumn("access_timestamp",
      to_timestamp(lit("2024-01-10 22:00:00")) + expr("INTERVAL 1 MINUTE") * col("activity_id"))
    val got = Detect.classify(offHours, Detect.ipBlacklist(spark))
      .select($"activity_id", $"severity_level", $"suspicious_reasons")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == "Medium",
      s"off-hours + large extraction must stay Medium, got ${got(1L)}")
    assert(got(1L)._2 ==
      "Access outside working hours; Large data extraction: 5000 rows")
    assert(got(2L)._1 == "High",
      s"guest-write must downgrade the blacklist Critical, got ${got(2L)}")
    assert(got(3L)._1 == "Critical")
  }

  test("C4 injection battery: all 15 labels, first-match break order") {
    val statements = Seq(
      1L -> ("SELECT a FROM t UNION SELECT b", "SQL Injection - UNION"),
      2L -> ("SELECT x FROM information_schema.columns", "Schema Enumeration"),
      3L -> ("DROP TABLE users_backup", "DROP Table Attempt"),
      4L -> ("TRUNCATE TABLE logs", "TRUNCATE Attempt"),
      5L -> ("ALTER TABLE t ADD c INT", "ALTER Table Attempt"),
      6L -> ("CREATE USER bob", "CREATE User Attempt"),
      7L -> ("GRANT select ON t TO bob", "Privilege Escalation"),
      8L -> ("EXEC xp_cmdshell 'dir'", "xp_cmdshell Attempt"),
      9L -> ("SELECT 1; WAITFOR DELAY '0:0:5'", "Time-based Injection"),
      10L -> ("SELECT load_file('/etc/passwd')", "File Read Attempt"),
      11L -> ("SELECT x FROM t INTO OUTFILE '/tmp/f'", "File Write Attempt"),
      12L -> ("SELECT 0xdeadbeefcafebabe12", "Hex Encoding Evasion"),
      13L -> ("SELECT sleep(10)", "Time-based Attack"),
      14L -> ("SELECT benchmark(1000, 'x')", "Benchmark Attack"),
      // pg_sleep( is SHADOWED by the earlier sleep\s*\( pattern — the
      // reference's first-match break makes its label unreachable
      15L -> ("SELECT pg_sleep(10)", "Time-based Attack"))
    val rows = statements.map { case (id, (stmt, _)) =>
      (id, id, s"u$id", "Admin", "SELECT", "t_$id", stmt, "10.0.0.1", 0L) }
    val got = classify(mkActivity(rows))
    statements.foreach { case (id, (stmt, label)) =>
      assert(got(id)._2 == "Critical", s"$stmt must be Critical")
      assert(got(id)._3.contains(s"Suspicious pattern: $label"),
        s"$stmt: expected label '$label', got '${got(id)._3}'")
    }
    assert(!got(15L)._3.contains("PostgreSQL"),
      "pg_sleep label must be shadowed by the sleep pattern")
  }

  test("C4 sensitive columns: reference set, one reason per match, in order") {
    val rows = Seq(
      (1L, 1L, "u", "Admin", "SELECT", "t",
        "SELECT salary, bank_account, ssn FROM employees", "10.0.0.1", 0L),
      // 'credit' alone (the repo's former over-broad token) must NOT match
      (2L, 2L, "u", "Admin", "SELECT", "t",
        "SELECT credit FROM scores", "10.0.0.1", 0L),
      // 'email' (the repo's former invented token) must NOT match
      (3L, 3L, "u", "Admin", "SELECT", "t",
        "SELECT email FROM contacts", "10.0.0.1", 0L))
    val got = classify(mkActivity(rows))
    // reasons follow SENSITIVE_COLUMNS order (ssn, bank_account, salary),
    // not statement order
    assert(got(1L)._3 == "Access to sensitive column: ssn; " +
      "Access to sensitive column: bank_account; Access to sensitive column: salary")
    assert(got(1L)._2 == "High")
    assert(got(2L)._2 == "Low" && got(2L)._3 == null)
    assert(got(3L)._2 == "Low" && got(3L)._3 == null)
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

  test("C5 alert-type quirks preserved: non-UNION injection is not " +
    "'SQL Injection'; the DoS arm is dead (case-sensitive match)") {
    val rows = Seq(
      // drop-table hit: label 'DROP Table Attempt' does NOT contain
      // 'SQL Injection' → Security Violation (app.py:415-420)
      (1L, 1L, "u", "Admin", "DROP", "t", "DROP TABLE t", "10.0.0.1", 0L),
      // guest-write (High) + over-threshold rate: reasons carry
      // 'Rate limit exceeded' but the reference matches lowercase
      // 'rate limit' → falls through to Security Violation
      (2L, 2L, "u2", "Guest", "DELETE", "t", "DELETE FROM t", "10.0.0.1", 0L),
      (3L, 2L, "u2", "Guest", "DELETE", "t", "DELETE FROM t", "10.0.0.1", 0L))
    val sameMinute = mkActivity(rows).withColumn("access_timestamp",
      to_timestamp(lit("2024-01-10 12:00:05")))
    val out = Detect.deriveAlerts(
      Detect.classify(sameMinute, Detect.ipBlacklist(spark), rateThreshold = 1))
      .select($"activity_id", $"alert_type", $"suspicious_reasons")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == "Security Violation")
    assert(out(2L)._2.contains("Rate limit exceeded"))
    assert(out(2L)._1 == "Security Violation",
      "the reference's 'rate limit' arm is case-sensitively dead")
  }

  test("C6 compliance findings match app.py:477-485 per branch") {
    val rows = Seq(
      // GDPR: sensitive table + FALSY user_id (0 here) — any operation
      (1L, 0L, "u0", "User", "SELECT", "users", "SELECT * FROM users", "ip", 0L),
      // identified access to a sensitive table: NO GDPR finding
      (2L, 1L, "u", "User", "SELECT", "users", "SELECT * FROM users", "ip", 0L),
      // SOX over all three tables; rows_affected truthy → Compliant
      (3L, 1L, "u", "User", "UPDATE", "accounts", "UPDATE accounts", "ip", 5L),
      (4L, 1L, "u", "User", "DELETE", "financial", "DELETE FROM financial", "ip", 0L),
      (5L, 1L, "u", "User", "UPDATE", "transactions", "UPDATE transactions", "ip", 2L),
      // SOX tables on a read: no finding
      (6L, 1L, "u", "User", "SELECT", "financial", "SELECT 1 FROM financial", "ip", 0L),
      // PCI over both tables, any operation
      (7L, 1L, "u", "User", "SELECT", "payments", "SELECT 1 FROM payments", "ip", 0L),
      (8L, 1L, "u", "User", "INSERT", "credit_cards", "INSERT INTO credit_cards", "ip", 1L),
      // the repo's former PCI 'sessions' drift must be gone
      (9L, 1L, "u", "User", "SELECT", "sessions", "SELECT 1 FROM sessions", "ip", 0L),
      // payments + user_id NULL → GDPR AND PCI co-fire
      (10L, 1L, "u", "User", "SELECT", "payments", "SELECT 1 FROM payments", "ip", 0L),
      (11L, 1L, "u", "User", "SELECT", "products", "SELECT 1", "ip", 0L))
    val df = mkActivity(rows).withColumn("user_id",
      when(col("activity_id") === 10L, lit(null).cast("long"))
        .otherwise(col("user_id")))
    val got = Detect.complianceFindings(df)
      .select($"activity_id", $"standard", $"status", $"finding")
      .as[(Long, String, String, String)].collect().toSet
    assert(got == Set(
      (1L, "GDPR", "Non-compliant", "Personal data access without user identification"),
      (3L, "SOX", "Compliant", "Financial data modification"),
      (4L, "SOX", "Review needed", "Financial data modification"),
      (5L, "SOX", "Compliant", "Financial data modification"),
      (7L, "PCI_DSS", "Monitored", "Cardholder data access detected"),
      (8L, "PCI_DSS", "Monitored", "Cardholder data access detected"),
      (10L, "GDPR", "Non-compliant", "Personal data access without user identification"),
      (10L, "PCI_DSS", "Monitored", "Cardholder data access detected")))
  }

  test("C6 report envelope carries the reference statistics block") {
    val rows = Seq(
      (1L, 0L, "u0", "User", "SELECT", "users", "SELECT * FROM users", "ip", 0L),
      (2L, 1L, "u", "User", "UPDATE", "accounts", "UPDATE accounts", "ip", 5L),
      (3L, 1L, "u", "User", "SELECT", "payments", "SELECT 1", "ip", 0L),
      (4L, 1L, "u", "User", "SELECT", "products", "SELECT 1", "ip", 0L))
    val got = Detect.complianceEnvelope(mkActivity(rows), "monthly")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(("monthly", 4L, 3L, "GDPR,SOX,HIPAA,PCI_DSS")))
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

  test("C8 reference seed profile: verbatim regexes, regex-only reach") {
    val ref = Detect.firewallRules(spark, "reference")
    assert(ref.count() == 7)
    val rows = Seq(
      // the production regex catches UNION ALL SELECT — the fixture's
      // contains-"union select" rule cannot (the r3 VERDICT example)
      (1L, 1L, "u", "User", "SELECT", "t", "SELECT a FROM t UNION ALL SELECT password FROM users", "ip", 0L),
      // whitespace-tolerant DROP   TABLE
      (2L, 1L, "u", "User", "DROP", "t", "DROP   TABLE audit_log", "ip", 0L),
      // string-boolean injection: quoted '1'='1 with padding
      (3L, 1L, "u", "User", "SELECT", "t", "SELECT * FROM t WHERE name = '' or '1'='1'", "ip", 0L),
      // priority 20 vs 10: sleep( (20) loses to union.*select (10)
      (4L, 1L, "u", "User", "SELECT", "t", "SELECT sleep(5) UNION SELECT 1", "ip", 0L),
      (5L, 1L, "u", "User", "SELECT", "t", "SELECT id FROM t WHERE x = 1 OR  1=1", "ip", 0L))
    val got = Detect.firewallMatch(mkActivity(rows), ref)
      .select($"activity_id", $"rule_id", $"action").as[(Long, Int, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1, "block")))
    assert(got(2L) == ((2, "block")))
    assert(got(3L) == ((7, "block")))
    assert(got(4L) == ((1, "block")))
    assert(got(5L) == ((6, "block")))
    // the fixture profile indeed misses the UNION ALL form
    val fixtureGot = Detect.firewallMatch(
      mkActivity(rows.take(1)), Detect.firewallRules(spark))
      .select($"activity_id").as[Long].collect()
    assert(fixtureGot.isEmpty)
    intercept[IllegalArgumentException](Detect.firewallRules(spark, "nope"))
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
    assert(got(2L)._2 == "Low" && got(2L)._3 == null)
    // a blacklist without expires_at passes through unfiltered
    val bare = Seq(("10.0.0.101", "r")).toDF("ip_address", "reason")
    val got2 = Detect.classify(mkActivity(rows), bare)
      .select($"activity_id", $"severity_level").as[(Long, String)]
      .collect().toMap
    assert(got2(2L) == "Critical")
  }

  test("C4 rate rule skips falsy keys (reference truthiness, app.py:396)") {
    // 4 events in one minute from a NULL user_id and 4 from user_id=0:
    // the reference's `if a["user_id"]` guard skips both, however far
    // over threshold; a truthy key over threshold fires
    val rows =
      (1 to 4).map(i => (i.toLong, "SELECT 1")) ++
      (5 to 8).map(i => (i.toLong, "SELECT 1")) ++
      Seq((9L, "SELECT 2"), (10L, "SELECT 2"))
    val df = rows.toDF("activity_id", "operation_details")
      .withColumn("user_id",
        when(col("activity_id") <= 4L, lit(null).cast("long"))
          .when(col("activity_id") <= 8L, 0L)
          .otherwise(7L))
      .withColumn("username", lit("u"))
      .withColumn("role", lit("Admin"))
      .withColumn("operation_type", lit("SELECT"))
      .withColumn("table_name", lit("products"))
      .withColumn("ip_address", lit("10.0.0.1"))
      .withColumn("rows_affected", lit(0L))
      .withColumn("operation_status", lit("Success"))
      .withColumn("access_timestamp", to_timestamp(lit("2024-01-10 12:00:10")))
    val got = Detect.classify(df, Detect.ipBlacklist(spark), rateThreshold = 1)
      .select($"activity_id", $"suspicious_reasons")
      .as[(Long, String)].collect().toMap
    (1L to 8L).foreach(i =>
      assert(got(i) == null, s"falsy-key row $i must not be rate-flagged"))
    assert(got(9L) == "Rate limit exceeded: 2 queries/min")
    assert(got(10L) == "Rate limit exceeded: 2 queries/min")
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
