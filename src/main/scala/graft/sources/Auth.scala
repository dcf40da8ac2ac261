package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Pbkdf2

/** The login flow over the users control table — reference
  * `UserManager.authenticate` (app.py:204-226) + the `/api/login`
  * route (app.py:1040-1058), re-expressed as a point lookup + driver
  * verify + an optional success mutation:
  *
  *  1. ONE user row by username (pushed parquet filter — the P1 point
  *     lookup, never a scan);
  *  2. reject-while-locked (app.py:212-215): `locked_until` in the
  *     future short-circuits everything, the caller gets the ts;
  *  3. PASSWORD VERIFICATION via [[graft.functions.Pbkdf2.check]] —
  *     the one step the reference's authenticate OMITS (app.py:204-226
  *     imports werkzeug's checker at app.py:60 but never calls it, so
  *     any password logs in; reproduced here as the obviously-intended
  *     semantics, not the bug). Seeded rows store PLAINTEXT passwords
  *     (app.py:1526 inserts `pwd` raw), so a stored value that is not
  *     a werkzeug hash falls back to constant-time plaintext equality
  *     — the reference's seed users keep working;
  *  4. status gate: only `account_status='Active'` may log in
  *     (app.py:218);
  *  5. on success, the reference's reset mutation (app.py:219-222:
  *     `last_login=NOW(), failed_attempts=0, locked_until=NULL`)
  *     applied through the users-table swap-write when `usersDir` is
  *     given.
  *
  * Failure composition: a rejected attempt is the caller's cue to log
  * a Failed LOGIN activity row (app.py:1054's logger); those rows are
  * what [[graft.operators.Detect.lockouts]] folds into lockout events
  * and [[Mutations.applyLockouts]] persists back onto this same users
  * table — authenticate then enforces them at step 2. The full loop is
  * spec-locked (AuthSpec).
  */
object Auth {

  sealed trait AuthResult
  /** No row for the username (authenticate → None, app.py:211). */
  case object NoUser extends AuthResult
  /** locked_until > now (app.py:212-215). */
  final case class Locked(lockedUntil: Timestamp) extends AuthResult
  /** Stored credential does not verify (plaintext or pbkdf2). */
  case object BadPassword extends AuthResult
  /** Verified but account_status != 'Active' (app.py:218, 224-226). */
  final case class Inactive(status: String) extends AuthResult
  /** Authenticated; carries the user row's identity columns. */
  final case class Ok(userId: Long, username: String, role: String)
      extends AuthResult

  /** Authenticate one (username, password) attempt against a users
    * frame. Pure — no mutation; see the `usersDir` overload for the
    * success-reset write. `now` anchors the lock check (tests pin it;
    * production passes the request time).
    */
  def authenticate(users: DataFrame, username: String, password: String,
                   now: Timestamp): AuthResult = {
    val cols = users.columns.toSet
    def opt(name: String): org.apache.spark.sql.Column =
      if (cols.contains(name)) col(name) else lit(null)
    // locked_until rides as its STRING form: the users table may carry
    // either timestamp flavor (NTZ from the parquet fixtures, LTZ from
    // legacy writers), and under the engine-wide UTC session both cast
    // to the same 'yyyy-MM-dd HH:mm:ss' text — one select works on both
    val row = users.filter(col("username") === username)
      .select(col("user_id").cast("long"), col("username"), col("role"),
        col("account_status"), opt("password_hash").cast("string"),
        opt("locked_until").cast("string").as("locked_until"))
      .limit(1).collect().headOption
    row match {
      case None => NoUser
      case Some(r) =>
        val lockedUntil = Option(r.getAs[String]("locked_until"))
          .map(Timestamp.valueOf)
        if (lockedUntil.exists(_.after(now))) Locked(lockedUntil.get)
        else {
          val stored = Option(r.getAs[String]("password_hash"))
          val verified = stored.exists { s =>
            if (Pbkdf2.parse(s).isDefined) Pbkdf2.check(s, password)
            else Pbkdf2.constantTimeEq(s, password)
          }
          if (!verified) BadPassword
          else r.getAs[String]("account_status") match {
            case "Active" =>
              Ok(r.getAs[Long]("user_id"), r.getAs[String]("username"),
                r.getAs[String]("role"))
            case other => Inactive(other)
          }
        }
    }
  }

  /** Authenticate against the persisted users table and, on success,
    * apply the reference's reset mutation (app.py:219-222) through the
    * crash-safe swap-write: `last_login = now`, `failed_attempts = 0`,
    * `locked_until = NULL` for exactly the authenticated row.
    */
  def authenticate(spark: SparkSession, usersDir: String, username: String,
                   password: String, now: Timestamp): AuthResult = {
    Mutations.recoverSwap(spark, usersDir)
    val result = authenticate(spark.read.parquet(usersDir), username,
      password, now)
    result match {
      case Ok(_, _, _) =>
        Mutations.updateRows(spark, usersDir,
          col("username") === username, Map(
            "last_login" -> lit(now).cast("timestamp_ntz"),
            "failed_attempts" -> lit(0),
            "locked_until" -> lit(null).cast("timestamp_ntz")))
        ()
      case _ => ()
    }
    result
  }

  /** `create_user` (app.py:233-236): hash the password werkzeug-style
    * and return the INSERT-ready row frame (caller appends it through
    * the users sink; id assignment follows the warehouse's per-batch
    * convention). Exposed as a frame so bulk seeding composes.
    */
  def newUserRow(spark: SparkSession, userId: Long, username: String,
                 password: String, role: String = "Guest",
                 createdAt: Timestamp = null): DataFrame = {
    import spark.implicits._
    Seq((userId, username, Pbkdf2.hash(password), role, "Active"))
      .toDF("user_id", "username", "password_hash", "role",
        "account_status")
      .withColumn("failed_attempts", lit(0))
      .withColumn("created_at",
        (if (createdAt == null) current_timestamp()
         else lit(createdAt)).cast("timestamp_ntz"))
  }
}
