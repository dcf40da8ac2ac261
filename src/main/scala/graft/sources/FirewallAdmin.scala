package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Firewall rule administration over the `firewall_rules` control
  * table (reference add_rule app.py:852-858 / POST app.py:1318-1326,
  * DELETE app.py:1329-1334, GET app.py:1311-1315). rule_id is
  * max+1 — NOT content-addressed like the other tables, because the
  * matcher's priority TIE-BREAK is insertion order (lowest rule_id
  * wins within a priority, see Detect.firewallMatch), so ids must be
  * monotone in insertion order; the dim is KB-scale, so the max read
  * is trivial. The table this manages is what a deployment passes to
  * [[graft.operators.Detect.firewallMatch]] /
  * [[graft.streaming.Ingest.start]] in place of the seed fixture.
  */
object FirewallAdmin {

  private def dirOf(rootDir: String) = s"$rootDir/firewall_rules"

  def listRules(spark: SparkSession, rootDir: String): DataFrame =
    spark.read.parquet(dirOf(rootDir))
      .orderBy(col("priority"), col("rule_id"))

  def addRule(spark: SparkSession, rootDir: String, pattern: String,
              description: String, matchType: String, action: String,
              priority: Int, appliesToUser: Option[String] = None,
              appliesToIp: Option[String] = None): Int = {
    require(Seq("contains", "starts_with", "regex").contains(matchType),
      s"unknown match_type: $matchType")
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    val cur = spark.read.parquet(dir)
    val nextId = cur.agg(max(col("rule_id"))).collect()(0) match {
      case r if r.isNullAt(0) => 1
      case r => r.getInt(0) + 1
    }
    import spark.implicits._
    Seq((nextId, pattern, description, matchType, action, priority,
      appliesToUser, appliesToIp, true))
      .toDF("rule_id", "pattern", "description", "match_type", "action",
        "priority", "applies_to_user", "applies_to_ip", "is_active")
      .write.mode(SaveMode.Append).parquet(dir)
    nextId
  }

  /** DELETE /api/v2/firewall/rules/<id> — the reference really deletes
    * the row (blocks referencing it FK SET NULL; our blocks records
    * are immutable history and simply keep the id).
    */
  def deleteRule(spark: SparkSession, rootDir: String, ruleId: Int): Long =
    Mutations.deleteRows(spark, dirOf(rootDir), col("rule_id") === ruleId)

  /** Disable without deleting (is_active=0 — the matcher skips it). */
  def deactivateRule(spark: SparkSession, rootDir: String,
                     ruleId: Int): Long =
    Mutations.updateRows(spark, dirOf(rootDir), col("rule_id") === ruleId,
      Map("is_active" -> lit(false)))
}
