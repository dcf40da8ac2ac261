package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-classification engines re-expressed as pure
  * Catalyst `Column` pipelines (no UDFs — everything stays inside
  * whole-stage codegen, which is what keeps these cheap at 100 TB:
  * each classifier is a handful of string intrinsics evaluated
  * per-row inside the scan stage, no shuffle, no JVM boundary).
  *
  * Reference semantics: dam_agent.py:28-145 (skip filter, hex decode,
  * op classifier, table extractor, username extractor) and
  * app.py:1181 (status classifier).
  */
object Classify {

  /** C1 — operation classifier (reference dam_agent.py:76-104):
    * first-matching-prefix of the upper-cased, trimmed SQL text.
    */
  def operationType(sql: Column): Column = {
    val s = upper(ltrim(sql))
    val prefixes = Seq(
      "SELECT" -> "SELECT", "INSERT" -> "INSERT", "UPDATE" -> "UPDATE",
      "DELETE" -> "DELETE", "CREATE" -> "CREATE", "DROP" -> "DROP",
      "ALTER" -> "ALTER", "TRUNCATE" -> "TRUNCATE", "GRANT" -> "GRANT",
      "REVOKE" -> "REVOKE", "CALL" -> "PROCEDURE", "EXEC" -> "PROCEDURE")
    prefixes.foldRight(lit("OTHER")) { case ((p, label), acc) =>
      when(s.startsWith(p), label).otherwise(acc)
    }
  }

  /** C2 — table-name extractor (reference dam_agent.py:107-123):
    * ordered regexes, first capture group wins, else "unknown".
    * `regexp_extract` returns "" on miss, so each candidate is
    * null-ified before the coalesce.
    */
  def tableNameOf(sql: Column): Column = {
    def grab(pat: String): Column =
      nullif(regexp_extract(sql, pat, 1), lit(""))
    coalesce(
      grab("(?i)\\bfrom\\s+([a-zA-Z_][a-zA-Z0-9_]*)"),
      grab("(?i)\\binto\\s+([a-zA-Z_][a-zA-Z0-9_]*)"),
      grab("(?i)\\bupdate\\s+([a-zA-Z_][a-zA-Z0-9_]*)"),
      grab("(?i)\\btable\\s+([a-zA-Z_][a-zA-Z0-9_]*)"),
      grab("(?i)\\bjoin\\s+([a-zA-Z_][a-zA-Z0-9_]*)"),
      lit("unknown"))
  }

  /** C3 — username extractor (reference dam_agent.py:135-145):
    * prefix of `user_host` before '[', else before '@', else SYSTEM.
    */
  def usernameOf(userHost: Column): Column = {
    def grab(pat: String): Column =
      nullif(trim(regexp_extract(userHost, pat, 1)), lit(""))
    coalesce(
      grab("^([^\\[]+)\\["),
      grab("^([^@\\[]+)@"),
      lit("SYSTEM"))
  }

  /** P9 — status classifier (reference app.py:1181): Failed iff the
    * query text contains "error" or "failed" (case-insensitive).
    */
  def statusOf(sql: Column): Column = {
    val l = lower(sql)
    when(l.contains("error") || l.contains("failed"), "Failed")
      .otherwise("Success")
  }

  /** P10 — agent skip-filter (reference dam_agent.py:28-43): TRUE for
    * rows that should be KEPT (i.e. not a system/housekeeping query).
    */
  val SkipPattern: String =
    "(?is)^\\s*(SET\\s+|SHOW\\s+|COMMIT|ROLLBACK|START\\s+TRANSACTION|" +
    "FLUSH\\s+|USE\\s+|DESCRIBE\\s+|EXPLAIN\\s+)|" +
    "information_schema|performance_schema|mysql\\.general_log"
  def keepQuery(sql: Column): Column =
    sql.isNotNull && !sql.rlike(SkipPattern)

  /** Lenient hex-decoder (reference dam_agent.py:46-73): general_log
    * arguments sometimes arrive as 0x-prefixed hex; decode when the
    * payload is well-formed even-length hex, else pass through.
    */
  def lenientHexDecode(arg: Column): Column = {
    val isHex = arg.rlike("^0x(?:[0-9a-fA-F]{2})+$")
    when(isHex, decode(unhex(substring(arg, 3, 1000000)), "UTF-8"))
      .otherwise(arg)
  }

  /** S5 — query-dedup hash (reference app.py:258): md5 of the
    * normalized statement text for audit correlation.
    */
  def queryHash(sql: Column): Column = md5(sql)
}
