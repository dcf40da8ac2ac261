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

  test("mergeUpsert: source wins on match, inserts new keys, incremental ≡ full recompute") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "tag", "v")
    val source = Seq((2L, "B", 200), (4L, "d", 40)).toDF("k", "tag", "v")
    val merged = Mutations.mergeUpsert(target, source, Seq("k"))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(merged == Seq((1L, "a", 10), (2L, "B", 200), (3L, "c", 30),
      (4L, "d", 40)))

    // incremental snapshot maintenance ≡ full recompute on real data:
    // latest-per-user over all events == merge(delta compaction into
    // base compaction) — the invariant ev_snapshot_merge relies on
    val ev = Tables.events(spark, sf("sf0.001"))
    def compact(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("last_event_id"))
    val cut = lit("2024-01-20").cast("timestamp_ntz")
    val inc = Mutations.mergeUpsert(compact(ev.filter(col("ts") < cut)),
      compact(ev.filter(col("ts") >= cut)), Seq("user_id"))
    val full = compact(ev)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    // merge is an aggregate + anti-join shape: no window anywhere
    assert(!inc.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("applyCdc: deletes remove, upserts replace, unmatched delete is a no-op") {
    val target = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "v")
    val changes = Seq((2L, 0, "D"), (3L, 300, "U"), (4L, 40, "U"),
      (9L, 0, "D")).toDF("k", "v", "op")
    val out = Mutations.applyCdc(target, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 10), (3L, 300), (4L, 40)))
  }

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

  test("lockout detection drives the users-table mutation end to end") {
    val dir = Files.createTempDirectory("lock").toString + "/users"
    graft.sources.TableRegistry.seedUsers(spark).write.parquet(dir)
    // user1: 3 consecutive failures → lockout event at the 3rd
    val act = Seq(
      (1L, "user1", "Failed", "2024-01-10 12:01:00"),
      (2L, "user1", "Failed", "2024-01-10 12:02:00"),
      (3L, "user1", "Failed", "2024-01-10 12:03:00"),
      (4L, "guest1", "Failed", "2024-01-10 12:04:00"),
      (5L, "guest1", "Success", "2024-01-10 12:05:00"))
      .toDF("activity_id", "username", "operation_status", "ts_s")
      .withColumn("access_timestamp",
        to_timestamp($"ts_s").cast("timestamp_ntz")).drop("ts_s")
    val lockouts = Detect.lockouts(act, maxAttempts = 3, lockoutMinutes = 30)
    assert(Mutations.applyLockouts(spark, dir, lockouts) == 1)
    val back = spark.read.parquet(dir)
      .select($"username", $"account_status", $"locked_until".isNotNull)
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(back("user1") == (("Locked", true)))
    assert(back("guest1") == (("Active", false)))
    assert(back("admin") == (("Active", false)))
    val until = spark.read.parquet(dir).filter($"username" === "user1")
      .select(date_format($"locked_until", "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()(0)
    assert(until == "2024-01-10 12:33:00") // locked_at + 30 min
    // no-op when nothing matches
    assert(Mutations.applyLockouts(spark, dir,
      Detect.lockouts(act.filter($"username" === "nobody"))) == 0)
  }

  test("mutations preserve a partitioned table's directory layout") {
    val dir = Files.createTempDirectory("mutpart").toString + "/alerts"
    // streaming-sink shape: partitioned by ingest_batch
    Seq((1L, "New", 0L), (2L, "New", 0L), (3L, "New", 1L))
      .toDF("activity_id", "status", "ingest_batch")
      .write.partitionBy("ingest_batch").parquet(dir)
    assert(Mutations.resolveAlert(spark, dir, 2L,
      Timestamp.valueOf("2024-01-10 12:00:00")) == 1)
    // layout survived: still col=value subdirectories
    val subdirs = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.contains("ingest_batch="))
    assert(subdirs.nonEmpty, "mutation flattened the partitioned table")
    // the next micro-batch's dynamic partition overwrite still works
    Seq((4L, "New", "x", 2L))
      .toDF("activity_id", "status", "resolved_flag", "ingest_batch")
      .drop("resolved_flag")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(dir)
    val back = spark.read.parquet(dir)
      .select($"activity_id", $"status").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "New"), (2L, "Resolved"), (3L, "New"),
      (4L, "New")))
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

  test("pdf report: valid structure, multi-page, parseable xref") {
    val out = Files.createTempDirectory("pdf").toString + "/r/report.pdf"
    val df = (1 to 130).map(i => (i.toLong, s"row$i (x\\y)")).toDF("id", "label")
    Report.writePdfReport(df.orderBy($"id"), out, "Test PDF", cap = 130)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(text.startsWith("%PDF-1.4"))
    assert(text.endsWith("%%EOF\n"))
    // 3 header lines + 130 rows = 133 lines → 3 pages at 60/page
    assert(text.contains("/Count 3"))
    assert(text.split("/Type /Page ", -1).length - 1 == 3)
    // escaped parens survive; xref offsets actually point at objects
    assert(text.contains("""(1 | row1 \(x\\y\)) Tj"""))
    val xrefAt = text.split("startxref\n")(1).split("\n")(0).toLong
    assert(text.substring(xrefAt.toInt).startsWith("xref"))
    val firstOff = text.split("\n0000000000 65535 f \n")(1)
      .split("\n")(0).split(" ")(0).toLong
    assert(text.substring(firstOff.toInt).startsWith("1 0 obj"))
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
    // the seam carries the triggering alert's ACTOR (reference
    // dispatch_alert renders alert.get('username','unknown')): a
    // username-aware notifier sees real usernames, "unknown" only
    // where the alert carries none
    val actors = new java.util.concurrent.ConcurrentLinkedQueue[String]
    Report.dispatchAlerts(cls, new Report.Notifier {
      override def notify(t: String, s: String, d: String): Unit = ()
      override def notify(t: String, s: String, d: String,
                          username: String): Unit = { actors.add(username); () }
    })
    val seen = actors.toArray(Array.empty[String]).toSeq
    assert(seen.size == n)
    assert(seen.exists(_ != "unknown"),
      "dispatch must thread real usernames through the seam")
    assert(seen.forall(_.nonEmpty))
  }

  test("report_log append: schema matches bootstrap, id deterministic") {
    val root = Files.createTempDirectory("replog").toString
    graft.sources.TableRegistry.initWarehouse(spark, root)
    val dir = root + "/report_log"
    assert(spark.read.parquet(dir).count() == 0)
    val t = Timestamp.valueOf("2024-01-10 07:00:00")
    val df = Seq((1L, "x")).toDF("id", "label")
    Report.writeLoggedReport(df, root + "/out/daily.txt", "Daily",
      dir, "daily", t)
    Report.logReport(spark, dir, "weekly", root + "/out/weekly.txt", t)
    val back = spark.read.parquet(dir)
    assert(back.schema.fieldNames.sorted.toSeq ==
      Seq("created_at", "file_path", "report_id", "report_type"))
    val rows = back.select($"report_type", $"file_path")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("daily", root + "/out/daily.txt"),
      ("weekly", root + "/out/weekly.txt")))
    // content-addressed id: same (type, path, ts) → same id
    val ids = back.filter($"report_type" === "daily")
      .select($"report_id").as[Long].collect()
    Report.logReport(spark, dir, "daily", root + "/out/daily.txt", t)
    val again = spark.read.parquet(dir).filter($"report_type" === "daily")
      .select($"report_id").as[Long].collect()
    assert(again.toSet == ids.toSet && again.length == 2)
  }

  test("firewall admin: add/deactivate/delete rules drive the matcher") {
    import graft.sources.FirewallAdmin
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val root = Files.createTempDirectory("fwadmin").toString
    graft.sources.TableRegistry.initWarehouse(spark, root)
    // a fresh warehouse ships the reference's 7 production seed rules
    val seeded = graft.operators.Detect.ReferenceFirewallSeed.length
    assert(FirewallAdmin.listRules(spark, root).count() == seeded)
    // new rule gets the next insertion-ordered id (tie-break contract)
    val id = FirewallAdmin.addRule(spark, root, "truncate table",
      "Truncate block", "contains", "block", 1)
    assert(id == seeded + 1)
    val activity = Seq((1L, "u", "TRUNCATE TABLE audit_log", "10.0.0.1"))
      .toDF("activity_id", "username", "operation_details", "ip_address")
      .withColumn("access_timestamp", to_timestamp(lit("2024-01-10 12:00:00")))
    def matchedRule(): Option[Int] = graft.operators.Detect
      .firewallMatch(activity, FirewallAdmin.listRules(spark, root))
      .select($"rule_id").as[Int].collect().headOption
    assert(matchedRule().contains(id))
    // deactivation stops matching without removing history
    assert(FirewallAdmin.deactivateRule(spark, root, id) == 1)
    assert(matchedRule().isEmpty)
    assert(FirewallAdmin.listRules(spark, root).count() == seeded + 1)
    // hard delete removes the row entirely
    assert(FirewallAdmin.deleteRule(spark, root, id) == 1)
    assert(FirewallAdmin.listRules(spark, root).count() == seeded)
    // null-predicate rows survive deleteRows (three-valued logic)
    val n = graft.sources.Mutations.deleteRows(spark,
      root + "/firewall_rules", col("applies_to_user") === "nobody")
    assert(n == 0)
    assert(FirewallAdmin.listRules(spark, root).count() == seeded)
  }

  test("webhook registry: https-only, upsert reactivates, fireAll fans out") {
    import graft.sources.Webhooks
    val root = Files.createTempDirectory("webhooks").toString
    graft.sources.TableRegistry.initWarehouse(spark, root)
    val t = Timestamp.valueOf("2024-01-10 07:00:00")
    intercept[IllegalArgumentException](
      Webhooks.register(spark, root, "http://insecure.example/h", t))
    val id1 = Webhooks.register(spark, root, "https://a.example/hook", t)
    Webhooks.register(spark, root, "https://b.example/hook", t)
    assert(Webhooks.list(spark, root).count() == 2)
    // deactivate, then re-register: reactivated in place, no duplicate
    assert(Webhooks.deactivate(spark, root, "https://a.example/hook") == 1)
    assert(Webhooks.list(spark, root).count() == 1)
    assert(Webhooks.register(spark, root, "https://a.example/hook", t) == id1)
    assert(Webhooks.list(spark, root).count() == 2)
    assert(spark.read.parquet(root + "/webhooks").count() == 2)
    // fireAll: every High/Critical alert's envelope to every active URL
    val cls = Detect.classify(Tables.activity(spark, sf("sf0.001")),
      Detect.ipBlacklist(spark))
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    val n = Webhooks.fireAll(spark, root, cls,
      (u, j) => { sent.add((u, j)); () })
    val nAlerts = Detect.deriveAlerts(cls).count()
    assert(n == nAlerts * 2 && sent.size.toLong == n)
    assert(sent.peek()._2.contains("\"source\":\"DAM-v3\""))
  }

  test("webhook fan-out runs on executors; driver holds only the URL dim") {
    import graft.sources.Webhooks
    val root = Files.createTempDirectory("webhooks_dist").toString
    graft.sources.TableRegistry.initWarehouse(spark, root)
    val t = Timestamp.valueOf("2024-01-10 07:00:00")
    Webhooks.register(spark, root, "https://a.example/hook", t)
    Webhooks.register(spark, root, "https://b.example/hook", t)
    val cls = Detect.classify(Tables.activity(spark, sf("sf0.001")),
      Detect.ipBlacklist(spark))
    DistributedPostSink.reset()
    val n = Webhooks.fireAllDistributed(spark, root, cls,
      () => (u, j) => DistributedPostSink.record(u, j))
    val nAlerts = Detect.deriveAlerts(cls).count()
    assert(n == nAlerts * 2)
    assert(DistributedPostSink.size.toLong == n)
    // every delivery happened on an executor task thread, not the
    // driver (local mode shares the JVM, so the thread name is the
    // discriminator)
    val threads = DistributedPostSink.threads
    assert(threads.nonEmpty &&
      threads.forall(_.contains("Executor task launch worker")),
      s"deliveries ran on: $threads")
    // empty URL dim: no job at all
    val root2 = Files.createTempDirectory("webhooks_none").toString
    graft.sources.TableRegistry.initWarehouse(spark, root2)
    assert(Webhooks.fireAllDistributed(spark, root2, cls,
      () => (_, _) => fail("must not post")) == 0L)
  }

  test("report_log append fails fast on a legacy (mismatched) schema") {
    val root = Files.createTempDirectory("replog_legacy").toString
    val dir = root + "/report_log"
    // a pre-upgrade layout: Int report_id, no created_at
    Seq((1, "daily", "/x.txt")).toDF("report_id", "report_type", "file_path")
      .write.parquet(dir)
    val t = Timestamp.valueOf("2024-01-10 07:00:00")
    val e = intercept[IllegalArgumentException] {
      Report.logReport(spark, dir, "weekly", root + "/w.txt", t)
    }
    assert(e.getMessage.contains("migrate"))
    // the directory was NOT polluted with a second schema
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("alert wire payload: fixed envelope shape, parseable JSON") {
    val cls = Detect.classify(Tables.activity(spark, sf("sf0.001")),
      Detect.ipBlacklist(spark))
    val wire = Report.alertWireJson(cls)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("timestamp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("alert_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("alert_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("severity",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("description",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("username",
            org.apache.spark.sql.types.StringType))))))
    val parsed = wire
      .select($"activity_id", from_json($"wire_json", schema).as("j"))
      .select($"activity_id", $"j.source", $"j.payload.alert_id",
        $"j.payload.severity")
      .as[(Long, String, Long, String)].collect()
    assert(parsed.nonEmpty)
    parsed.foreach { case (aid, src, alertId, sev) =>
      assert(src == "DAM-v3")
      assert(alertId == aid)
      assert(sev == "High" || sev == "Critical")
    }
    // webhook-shaped transport sees the raw JSON strings
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val n = Report.dispatchWire(cls, new Report.WireNotifier {
      override def post(json: String): Unit = { seen.add(json); () }
    })
    assert(n == parsed.length && seen.size() == parsed.length)
    assert(Report.WireEventHeader == ("X-DAM-Event" -> "security-alert"))
  }

  test("report scheduler: runs the period job, logs and notifies each run") {
    val root = Files.createTempDirectory("sched").toString
    graft.sources.TableRegistry.initWarehouse(spark, root)
    val notifier = new Report.CollectingNotifier
    val tick = new java.util.concurrent.atomic.AtomicLong(0L)
    val sched = new graft.export.ReportScheduler(
      activity = () => Tables.activity(spark, sf("sf0.001")),
      outDir = root + "/reports",
      reportLogDir = root + "/report_log",
      notifier = notifier,
      clock = () => Timestamp.valueOf(
        s"2024-01-10 07:00:0${tick.getAndIncrement()}"))
    try {
      val p1 = sched.runOnce("daily")
      val p2 = sched.runOnce("weekly")
      assert(Files.exists(java.nio.file.Paths.get(p1)))
      assert(Files.exists(java.nio.file.Paths.get(p2)))
      // scheduled reports are real PDFs (reference writes reportlab PDFs)
      assert(p1.endsWith(".pdf"))
      assert(new String(Files.readAllBytes(java.nio.file.Paths.get(p1)),
        java.nio.charset.StandardCharsets.ISO_8859_1).startsWith("%PDF-1.4"))
      val logged = spark.read.parquet(root + "/report_log")
        .select($"report_type", $"file_path").as[(String, String)]
        .collect().toSet
      assert(logged == Set(("daily", p1), ("weekly", p2)))
      assert(notifier.sent.size() == 2)
      // fixed-rate scheduling drives the same job repeatedly
      sched.start("daily", intervalMs = 150L)
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (spark.read.parquet(root + "/report_log").count() < 4 &&
        System.nanoTime() < deadline) Thread.sleep(100)
      assert(spark.read.parquet(root + "/report_log").count() >= 4)
    } finally sched.stop()
  }
}

/** Executor-side delivery recorder for the distributed fan-out spec:
  * a static sink (local mode shares one JVM) capturing (url, json,
  * thread) so the spec can assert deliveries ran on task threads.
  */
object DistributedPostSink {
  private val sent =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]
  def reset(): Unit = sent.clear()
  def record(u: String, j: String): Unit = {
    sent.add((u, j, Thread.currentThread().getName)); ()
  }
  def size: Int = sent.size
  def threads: Set[String] = {
    val it = sent.iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()._3
    b.result()
  }
}
