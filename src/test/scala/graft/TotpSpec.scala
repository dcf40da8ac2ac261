package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.functions.Totp
import graft.sources.{TableRegistry, TwoFactor}

/** RFC 6238 TOTP + the user_2fa enrollment flow (reference
  * app.py:779-812).
  */
class TotpSpec extends SparkSpecBase {

  // RFC 6238 Appendix B secret (ASCII "12345678901234567890")
  private val rfcSecret =
    Totp.base32Encode("12345678901234567890".getBytes("US-ASCII"))

  test("RFC 6238 Appendix B SHA-1 test vectors") {
    val vectors = Seq(
      59L -> "94287082",
      1111111109L -> "07081804",
      1111111111L -> "14050471",
      1234567890L -> "89005924",
      2000000000L -> "69279037",
      20000000000L -> "65353130")
    vectors.foreach { case (t, expected) =>
      assert(Totp.code(rfcSecret, t * 1000L, digits = 8) == expected,
        s"at T=$t")
    }
  }

  test("base32 round-trips and rejects junk") {
    val bytes = Array.tabulate[Byte](20)(i => (i * 13).toByte)
    assert(Totp.base32Decode(Totp.base32Encode(bytes)).toSeq == bytes.toSeq)
    intercept[IllegalArgumentException](Totp.base32Decode("abc!def"))
  }

  test("verify honors the ±1-step window and rejects beyond it") {
    val t = 1111111109000L
    val c = Totp.code(rfcSecret, t)
    assert(Totp.verify(rfcSecret, c, t))
    assert(Totp.verify(rfcSecret, c, t + 30000L)) // next step, window 1
    assert(Totp.verify(rfcSecret, c, t - 30000L))
    assert(!Totp.verify(rfcSecret, c, t + 61000L)) // two steps out
    // window 0 = exact step only: the same code accepted at t is
    // rejected one step later
    assert(Totp.verify(rfcSecret, c, t, window = 0))
    assert(!Totp.verify(rfcSecret, c, t + 30000L, window = 0))
  }

  test("provisioning URI carries issuer, account, and secret") {
    val uri = Totp.provisioningUri("ABC234", "user one", "DAM System")
    assert(uri.startsWith("otpauth://totp/DAM%20System:user%20one?"))
    assert(uri.contains("secret=ABC234") && uri.contains("issuer=DAM%20System"))
  }

  test("user_2fa flow: setup disabled, confirm enables, verify gates") {
    val root = Files.createTempDirectory("twofa").toString
    TableRegistry.initWarehouse(spark, root)
    val t0 = 1700000000000L
    val created = Timestamp.valueOf("2024-01-10 09:00:00")
    val secret = Totp.secretFromSeed(42L)

    val uri = TwoFactor.setup(spark, root, 7L, "user7", secret, created)
    assert(uri.contains("secret=" + secret))
    // enrolled but NOT confirmed → verify still passes (not enabled)
    assert(TwoFactor.verify(spark, root, 7L, "000000", t0))

    // wrong code does not confirm
    assert(!TwoFactor.confirm(spark, root, 7L, "000000", t0,
      new Timestamp(t0)))
    // live code confirms and enables
    assert(TwoFactor.confirm(spark, root, 7L, Totp.code(secret, t0), t0,
      new Timestamp(t0)))
    val row = spark.read.parquet(s"$root/user_2fa")
      .filter(org.apache.spark.sql.functions.col("user_id") === 7L)
      .collect()(0)
    assert(row.getAs[Boolean]("enabled"))

    // enabled user: bad code rejected, good code passes
    assert(!TwoFactor.verify(spark, root, 7L, "123456", t0))
    assert(TwoFactor.verify(spark, root, 7L, Totp.code(secret, t0), t0))
    // a different, never-enrolled user passes (reference app.py:808)
    assert(TwoFactor.verify(spark, root, 99L, "junk", t0))

    // disable (app.py:811-812): enabled=0, secret preserved — any code
    // passes again, and a later confirm re-enables without re-setup
    assert(TwoFactor.disable(spark, root, 7L))
    assert(TwoFactor.verify(spark, root, 7L, "junk", t0))
    val afterDisable = spark.read.parquet(s"$root/user_2fa")
      .filter(org.apache.spark.sql.functions.col("user_id") === 7L)
      .collect()(0)
    assert(!afterDisable.getAs[Boolean]("enabled"))
    assert(afterDisable.getAs[String]("totp_secret") == secret)
    assert(TwoFactor.confirm(spark, root, 7L, Totp.code(secret, t0), t0,
      new Timestamp(t0)))
    assert(!TwoFactor.verify(spark, root, 7L, "123456", t0))
    // disabling a never-enrolled user reports no row (endpoint still
    // answers success in the reference — the flag is informational)
    assert(!TwoFactor.disable(spark, root, 99L))

    // re-setup rotates the secret and drops back to disabled
    val secret2 = Totp.secretFromSeed(43L)
    TwoFactor.setup(spark, root, 7L, "user7", secret2, created)
    assert(TwoFactor.verify(spark, root, 7L, "junk", t0)) // disabled again
    assert(spark.read.parquet(s"$root/user_2fa").count() == 1)
  }
}
