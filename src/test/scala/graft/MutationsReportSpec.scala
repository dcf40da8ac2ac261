package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.export.Report
import graft.operators.Detect
import graft.sources.{Mutations, Tables}

/** Row-mutation (read-merge-rewrite) and export/notify adapter tests. */
class MutationsReportSpec extends SparkSpecBase {
  import spark.implicits._

  test("updateRows mutates matching rows, swaps table atomically") {
    val dir = Files.createTempDirectory("mut").toString + "/alerts"
    Seq((1L, "New"), (2L, "New"), (3L, "Investigating"))
      .toDF("activity_id", "status").write.parquet(dir)
    val n = Mutations.resolveAlert(spark, dir, 2L,
      Timestamp.valueOf("2024-01-10 12:00:00"))
    assert(n == 1)
    val back = spark.read.parquet(dir)
      .select($"activity_id", $"status", $"resolved_at".isNotNull)
      .as[(Long, String, Boolean)].collect().toSet
    assert(back == Set((1L, "New", false), (2L, "Resolved", true),
      (3L, "Investigating", false)))
    // second mutation over the rewritten table still works
    assert(Mutations.updateRows(spark, dir,
      col("status") === "Investigating",
      Map("status" -> lit("Resolved"))) == 1)
    assert(Mutations.updateRows(spark, dir,
      col("activity_id") === 99L, Map("status" -> lit("x"))) == 0)
  }

  test("account lock/unlock") {
    val dir = Files.createTempDirectory("mut2").toString + "/users"
    graft.sources.TableRegistry.seedUsers(spark).write.parquet(dir)
    assert(Mutations.setAccountStatus(spark, dir, "guest1", "Locked") == 1)
    val st = spark.read.parquet(dir).filter($"username" === "guest1")
      .select($"account_status").as[String].collect()(0)
    assert(st == "Locked")
  }

  test("text report caps rows and renders all columns") {
    val out = Files.createTempDirectory("rep").toString + "/r/report.txt"
    val df = (1 to 40).map(i => (i.toLong, s"row$i")).toDF("id", "label")
    Report.writeTextReport(df.orderBy($"id"), out, "Test Report", cap = 10)
    val lines = Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.get(0) == "Test Report")
    assert(lines.get(2) == "id | label")
    assert(lines.size == 13) // title + rule + header + 10 rows
    assert(lines.get(3) == "1 | row1")
  }

  test("alert dispatch notifies only High/Critical") {
    val cls = Detect.classify(Tables.activity(spark, sf("sf0.001")),
      Detect.ipBlacklist(spark))
    val notifier = new Report.CollectingNotifier
    val n = Report.dispatchAlerts(cls, notifier)
    assert(n > 0 && n == notifier.sent.size())
    notifier.sent.forEach { case (_, sev, _) =>
      assert(sev == "High" || sev == "Critical")
    }
  }
}
