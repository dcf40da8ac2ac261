package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Totp

/** The reference's 2FA enrollment/verification flow (TwoFactor,
  * app.py:779-812) over the `user_2fa` control table: setup upserts a
  * disabled secret (ON DUPLICATE KEY analog), confirm verifies a code
  * and flips `enabled`, verify passes users who never enrolled (the
  * reference returns True when no enabled row exists, app.py:808-810).
  * Timestamps are injectable so replays and fixtures stay
  * deterministic. Mutations ride the same swap-write machinery as the
  * other control tables ([[Mutations.updateRows]]).
  */
object TwoFactor {

  val Issuer = "DAM System"

  private def dirOf(rootDir: String) = s"$rootDir/user_2fa"

  private def hasUser(spark: SparkSession, dir: String, userId: Long): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir)) &&
      spark.read.parquet(dir).filter(col("user_id") === userId).count() > 0

  /** Fail fast before APPENDING into a legacy-schema user_2fa
    * directory (same hazard — and guard — as
    * [[graft.export.Report.logReport]]): a mixed-schema parquet table
    * breaks at read time, far from the write that caused it. A
    * directory with no readable footer counts as absent.
    */
  private def requireCompatibleSchema(spark: SparkSession, dir: String,
                                      incoming: org.apache.spark.sql.DataFrame): Unit =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      scala.util.Try(spark.read.parquet(dir).schema).toOption
        .foreach { existing =>
          require(shape(existing) == shape(incoming.schema),
            s"user_2fa at $dir has schema ${existing.simpleString}; " +
              s"expected ${incoming.schema.simpleString} — migrate the " +
              "existing directory before appending")
        }
    }

  /** Enroll (or re-enroll) a user: stores the secret disabled and
    * returns the otpauth:// provisioning URI (reference app.py:781-793;
    * the QR rasterization of that URI is presentation-side).
    */
  def setup(spark: SparkSession, rootDir: String, userId: Long,
            username: String, secret: String,
            createdAt: java.sql.Timestamp): String = {
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    if (hasUser(spark, dir, userId)) {
      Mutations.updateRows(spark, dir, col("user_id") === userId, Map(
        "totp_secret" -> lit(secret),
        "enabled" -> lit(false),
        "confirmed_at" -> lit(null).cast("timestamp")))
      ()
    } else {
      import spark.implicits._
      val row = Seq((userId, secret, false, createdAt,
        null.asInstanceOf[java.sql.Timestamp]))
        .toDF("user_id", "totp_secret", "enabled", "created_at",
          "confirmed_at")
      requireCompatibleSchema(spark, dir, row)
      row.write.mode(SaveMode.Append).parquet(dir)
    }
    Totp.provisioningUri(secret, username, Issuer)
  }

  /** Confirm enrollment with a live code (reference app.py:796-802):
    * on success the row flips to enabled with a confirmation stamp.
    */
  def confirm(spark: SparkSession, rootDir: String, userId: Long,
              code: String, nowMillis: Long,
              confirmedAt: java.sql.Timestamp): Boolean = {
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    if (!hasUser(spark, dir, userId)) false
    else {
      val secret = spark.read.parquet(dir)
        .filter(col("user_id") === userId)
        .select(col("totp_secret")).collect()(0).getString(0)
      val ok = Totp.verify(secret, code, nowMillis)
      if (ok) {
        Mutations.updateRows(spark, dir, col("user_id") === userId, Map(
          "enabled" -> lit(true),
          "confirmed_at" -> lit(confirmedAt)))
        ()
      }
      ok
    }
  }

  /** Disable 2FA (reference app.py:811-812 via /api/v2/2fa/disable,
    * app.py:1296-1300): unconditional `UPDATE user_2fa SET enabled=0`
    * — the secret and confirmation stamp are PRESERVED, so a later
    * [[confirm]] with a live code re-enables without re-enrollment.
    * Returns whether an enrollment row existed (the reference endpoint
    * reports success either way; the flag is for callers/tests).
    */
  def disable(spark: SparkSession, rootDir: String, userId: Long): Boolean = {
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    if (!hasUser(spark, dir, userId)) false
    else {
      Mutations.updateRows(spark, dir, col("user_id") === userId,
        Map("enabled" -> lit(false)))
      true
    }
  }

  /** Login-time check (reference app.py:805-810): a user without an
    * ENABLED enrollment passes; an enrolled user must present a valid
    * code within the ±1-step window.
    */
  def verify(spark: SparkSession, rootDir: String, userId: Long,
             code: String, nowMillis: Long): Boolean = {
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) true
    else {
      val rows = spark.read.parquet(dir)
        .filter(col("user_id") === userId && col("enabled"))
        .select(col("totp_secret")).collect()
      rows.isEmpty || Totp.verify(rows(0).getString(0), code, nowMillis)
    }
  }
}
