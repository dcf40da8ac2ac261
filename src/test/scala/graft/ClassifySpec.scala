package graft

import org.apache.spark.sql.functions._
import graft.functions.Classify

/** C1-C3 / P9 / P10 classifier unit tests (SURVEY §2.7; reference
  * semantics dam_agent.py:28-145, app.py:1181).
  */
class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def classifyOp(sqls: String*): Seq[String] =
    sqls.toDF("sql").select(Classify.operationType($"sql")).as[String].collect().toSeq

  test("C1 operation classifier: first-matching prefix") {
    assert(classifyOp(
      "SELECT * FROM t", "  select 1", "INSERT INTO t VALUES (1)",
      "update t set a=1", "DELETE FROM t", "CREATE TABLE t (a int)",
      "drop table t", "ALTER TABLE t ADD b int", "TRUNCATE t",
      "GRANT ALL ON t TO u", "REVOKE ALL ON t FROM u",
      "CALL proc()", "EXEC sp_who", "WITH x AS (SELECT 1) SELECT * FROM x",
      "") ==
      Seq("SELECT", "SELECT", "INSERT", "UPDATE", "DELETE", "CREATE",
        "DROP", "ALTER", "TRUNCATE", "GRANT", "REVOKE", "PROCEDURE",
        "PROCEDURE", "OTHER", "OTHER"))
  }

  test("C1 totality: every string maps to exactly one known label") {
    val labels = Set("SELECT", "INSERT", "UPDATE", "DELETE", "CREATE",
      "DROP", "ALTER", "TRUNCATE", "GRANT", "REVOKE", "PROCEDURE", "OTHER")
    val inputs = Seq("şELECT x", "\nSELECT", "se", "-- comment", "123",
      "SELECTx", "insertinto", "gr", "xyzzy")
    classifyOp(inputs: _*).foreach(l => assert(labels.contains(l)))
  }

  test("C2 table extractor: ordered regex fallthrough") {
    val got = Seq(
      "SELECT * FROM products WHERE id = 1",
      "INSERT INTO users (a) VALUES (1)",
      "UPDATE accounts SET b = 2",
      "CREATE TABLE sessions (x int)",
      "SELECT 1 JOIN orders ON true",
      "SHOW STATUS")
      .toDF("sql").select(Classify.tableNameOf($"sql")).as[String].collect().toSeq
    assert(got == Seq("products", "users", "accounts", "sessions", "orders", "unknown"))
  }

  test("C3 username extractor: bracket, at-sign, SYSTEM fallback") {
    val got = Seq("root[root] @ localhost []", "app@10.0.0.5", "", "  ")
      .toDF("h").select(Classify.usernameOf($"h")).as[String].collect().toSeq
    assert(got == Seq("root", "app", "SYSTEM", "SYSTEM"))
  }

  test("P9 status classifier") {
    val got = Seq("SELECT 1", "SELECT error_log", "login FAILED for x")
      .toDF("sql").select(Classify.statusOf($"sql")).as[String].collect().toSeq
    assert(got == Seq("Success", "Failed", "Failed"))
  }

  test("P10 skip filter drops system queries, keeps user queries") {
    val rows = Seq(
      ("SET GLOBAL x = 1", false),
      ("SHOW TABLES", false),
      ("COMMIT", false),
      ("SELECT * FROM information_schema.tables", false),
      ("SELECT * FROM orders", true),
      (null.asInstanceOf[String], false))
    val got = rows.map(_._1).toDF("sql")
      .select(coalesce(Classify.keepQuery($"sql"), lit(false))).as[Boolean].collect().toSeq
    assert(got == rows.map(_._2))
  }

  test("lenient hex decode: well-formed decodes, malformed passes through") {
    val got = Seq("0x53454c454354", "0x5A", "0xZZ", "0x123", "SELECT 1")
      .toDF("a").select(Classify.lenientHexDecode($"a")).as[String].collect().toSeq
    assert(got == Seq("SELECT", "Z", "0xZZ", "0x123", "SELECT 1"))
  }
}
