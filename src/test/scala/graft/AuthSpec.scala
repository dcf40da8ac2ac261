package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.functions.Pbkdf2
import graft.operators.Detect
import graft.sources.{Auth, Mutations}

/** Werkzeug-parity pbkdf2 + the authenticate flow (reference
  * app.py:60, 204-226, 1040-1058). The fixture hashes below were
  * generated OUTSIDE the JVM by the exact werkzeug math
  * (`hashlib.pbkdf2_hmac(algo, pw.encode(), salt.encode(), n).hex()`),
  * so a pass here is cross-implementation parity, not self-agreement.
  */
class AuthSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("pbkdf2: werkzeug-generated fixture hashes verify, wrong passwords don't") {
    // werkzeug 2.3 default method (pbkdf2:sha256:600000)
    val w1 = "pbkdf2:sha256:600000$AbCdEfGh12345678$2b68ec13b984aece2f58cf" +
      "b922335d832290ff5312069a2516aa5cab4c91d678"
    // older default iteration count
    val w2 = "pbkdf2:sha256:260000$ZyXwVuTs87654321$363f38718244daa9b88a56" +
      "4d3fbb07ff8dc38f46647719dd9f64bd4b9a7da3b8"
    // non-ASCII password (UTF-8 encoding parity)
    val w3 = "pbkdf2:sha256:1000$saltsaltsaltsalt$2cd7de9786043cab7a3d9f13" +
      "0ee20c53839cbc9c288412c7be8af74a3b9930e9"
    // sha1 branch
    val w4 = "pbkdf2:sha1:1$s$6bef5d45e7e911412083cfce8bce4514166a61d0"
    assert(Pbkdf2.check(w1, "admin123"))
    assert(Pbkdf2.check(w2, "user123"))
    assert(Pbkdf2.check(w3, "pässwörd"))
    assert(Pbkdf2.check(w4, "secret"))
    assert(!Pbkdf2.check(w1, "admin124"))
    assert(!Pbkdf2.check(w1, ""))
    // round-trip: our generator's output verifies and carries the format
    val h = Pbkdf2.hash("s3cr3t!", iterations = 1000)
    assert(h.startsWith("pbkdf2:sha256:1000$"))
    assert(Pbkdf2.check(h, "s3cr3t!") && !Pbkdf2.check(h, "s3cr3t"))
    // malformed / plaintext stored values reject, never throw
    assert(!Pbkdf2.check("admin123", "admin123"))
    assert(!Pbkdf2.check(null, "x") && !Pbkdf2.check("pbkdf2:sha256", "x"))
  }

  private def usersFixture = Seq(
    // hashed credential (werkzeug format, 1000 iters for test speed:
    // pbkdf2_hmac('sha256', b'admin123', b'fixedsaltfixedsa', 1000))
    (1L, "admin", Pbkdf2.hash("admin123", 1000, "fixedsaltfixedsa"),
      "Admin", "Active", null.asInstanceOf[Timestamp]),
    // the reference's PLAINTEXT seed shape (app.py:1526)
    (2L, "user1", "user123", "User", "Active",
      null.asInstanceOf[Timestamp]),
    (3L, "guest1", "guest123", "Guest", "Inactive",
      null.asInstanceOf[Timestamp]),
    (4L, "locked1", "lock123", "User", "Locked",
      ts("2024-01-10 12:30:00")))
    .toDF("user_id", "username", "password_hash", "role",
      "account_status", "locked_until")
    // the warehouse timestamp convention is NTZ (TESTDATA parquet)
    .withColumn("locked_until", col("locked_until").cast("timestamp_ntz"))

  test("authenticate: ok / bad password / no user / inactive / reject-while-locked") {
    val now = ts("2024-01-10 12:00:00")
    assert(Auth.authenticate(usersFixture, "admin", "admin123", now) ==
      Auth.Ok(1L, "admin", "Admin"))
    // plaintext seed row verifies by equality (the reference's seeds)
    assert(Auth.authenticate(usersFixture, "user1", "user123", now) ==
      Auth.Ok(2L, "user1", "User"))
    assert(Auth.authenticate(usersFixture, "admin", "wrong", now) ==
      Auth.BadPassword)
    assert(Auth.authenticate(usersFixture, "nobody", "x", now) ==
      Auth.NoUser)
    assert(Auth.authenticate(usersFixture, "guest1", "guest123", now) ==
      Auth.Inactive("Inactive"))
    // app.py:212-215: locked_until in the future rejects BEFORE any
    // password handling — even the correct password
    assert(Auth.authenticate(usersFixture, "locked1", "lock123", now) ==
      Auth.Locked(ts("2024-01-10 12:30:00")))
    // an EXPIRED lock no longer rejects (> comparison, app.py:213) but
    // the Locked status still gates at step 4
    val later = ts("2024-01-10 13:00:00")
    assert(Auth.authenticate(usersFixture, "locked1", "lock123", later) ==
      Auth.Inactive("Locked"))
  }

  test("authenticate against usersDir applies the success reset mutation (app.py:219-222)") {
    val dir = Files.createTempDirectory("auth").toString + "/users"
    usersFixture
      .withColumn("failed_attempts", lit(3))
      .write.parquet(dir)
    val now = ts("2024-01-10 12:00:00")
    assert(Auth.authenticate(spark, dir, "admin", "admin123", now) ==
      Auth.Ok(1L, "admin", "Admin"))
    val admin = spark.read.parquet(dir)
      .filter($"username" === "admin")
      .select($"failed_attempts", $"locked_until".isNull,
        $"last_login".cast("string")).head()
    assert(admin.getInt(0) == 0 && admin.getBoolean(1) &&
      admin.getString(2) == "2024-01-10 12:00:00")
    // other rows untouched
    assert(spark.read.parquet(dir).filter($"username" === "user1")
      .head().getAs[Int]("failed_attempts") == 3)
    // a failed attempt mutates nothing
    assert(Auth.authenticate(spark, dir, "admin", "wrong", now) ==
      Auth.BadPassword)
    assert(spark.read.parquet(dir).filter($"username" === "admin")
      .head().getAs[Int]("failed_attempts") == 0)
  }

  test("full lockout loop: failed logins → Detect.lockouts → applyLockouts → authenticate rejects") {
    val dir = Files.createTempDirectory("auth").toString + "/users"
    usersFixture.write.parquet(dir)
    // 5 failed LOGIN activities for admin inside one window
    val activity = (1 to 5).map { i =>
      ("admin", i.toLong, "Failed", ts(f"2024-01-10 11:0$i%d:00"))
    }.toDF("username", "activity_id", "operation_status",
      "access_timestamp")
      .withColumn("access_timestamp",
        col("access_timestamp").cast("timestamp_ntz"))
    val lk = Detect.lockouts(activity, maxAttempts = 5,
      lockoutMinutes = 30)
    assert(Mutations.applyLockouts(spark, dir, lk) == 1L)
    // locked_until = 11:05 + 30min = 11:35 — reject before then…
    assert(Auth.authenticate(spark, dir, "admin", "admin123",
      ts("2024-01-10 11:20:00")) ==
      Auth.Locked(ts("2024-01-10 11:35:00")))
    // …and after expiry the status gate still holds (Locked status
    // persisted by applyLockouts) until an admin unlock
    assert(Auth.authenticate(spark, dir, "admin", "admin123",
      ts("2024-01-10 12:00:00")) == Auth.Inactive("Locked"))
    Mutations.setAccountStatus(spark, dir, "admin", "Active")
    assert(Auth.authenticate(spark, dir, "admin", "admin123",
      ts("2024-01-10 12:00:00")) == Auth.Ok(1L, "admin", "Admin"))
  }

  test("newUserRow hashes werkzeug-style (app.py:233-236)") {
    val row = Auth.newUserRow(spark, 9L, "alice", "pw-9",
      createdAt = ts("2024-01-01 00:00:00"))
      .select($"user_id", $"username", $"password_hash", $"role",
        $"account_status").head()
    assert(row.getLong(0) == 9L && row.getString(1) == "alice" &&
      row.getString(3) == "Guest" && row.getString(4) == "Active")
    assert(row.getString(2).startsWith("pbkdf2:sha256:600000$"))
    assert(Pbkdf2.check(row.getString(2), "pw-9"))
  }
}
