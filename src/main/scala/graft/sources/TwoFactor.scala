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
      Seq((userId, secret, false, createdAt,
        null.asInstanceOf[java.sql.Timestamp]))
        .toDF("user_id", "totp_secret", "enabled", "created_at",
          "confirmed_at")
        .write.mode(SaveMode.Append).parquet(dir)
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
