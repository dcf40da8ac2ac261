package graft.functions

/** RFC 6238 TOTP (and its RFC 4226 HOTP core) — the reference's 2FA
  * verification surface (pyotp at reference app.py:779-812: 30 s
  * step, 6 digits, SHA-1, `valid_window=1`), as a dependency-free
  * driver-side utility. Auth is out of ENGINE scope (SURVEY §3) — no
  * DataFrame surface here; [[graft.sources.TwoFactor]] wires these
  * codes to the `user_2fa` control table.
  */
object Totp {

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 (the TOTP secret alphabet), padding-tolerant. */
  def base32Decode(s: String): Array[Byte] = {
    val clean = s.trim.toUpperCase.filterNot(_ == '=')
    var buffer = 0L
    var bits = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    clean.foreach { c =>
      val v = B32.indexOf(c)
      require(v >= 0, s"invalid base32 character: '$c'")
      buffer = (buffer << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out += ((buffer >> bits) & 0xff).toByte
      }
    }
    out.toArray
  }

  def base32Encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    bytes.foreach { b =>
      buffer = (buffer << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb += B32(((buffer >> bits) & 0x1f).toInt)
      }
    }
    if (bits > 0) sb += B32(((buffer << (5 - bits)) & 0x1f).toInt)
    sb.toString
  }

  /** Deterministically seeded 160-bit base32 secret (pyotp
    * `random_base32` analog; the seed injection keeps fixtures and
    * replays reproducible — pass a SecureRandom-derived seed in
    * production).
    */
  def secretFromSeed(seed: Long): String = {
    val rng = new java.util.Random(seed)
    val b = new Array[Byte](20)
    rng.nextBytes(b)
    base32Encode(b)
  }

  /** RFC 4226 HOTP: HMAC-SHA1 over the big-endian counter, dynamic
    * truncation, `digits` decimal digits zero-padded.
    */
  def hotp(key: Array[Byte], counter: Long, digits: Int = 6): String = {
    val msg = java.nio.ByteBuffer.allocate(8).putLong(counter).array
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "RAW"))
    val h = mac.doFinal(msg)
    val off = h(h.length - 1) & 0xf
    val bin = ((h(off) & 0x7f) << 24) | ((h(off + 1) & 0xff) << 16) |
      ((h(off + 2) & 0xff) << 8) | (h(off + 3) & 0xff)
    val mod = math.pow(10, digits.toDouble).toLong
    val code = bin % mod
    ("0" * digits + code.toString).takeRight(digits)
  }

  /** The TOTP code for a wall-clock instant. */
  def code(secret: String, epochMillis: Long, stepSeconds: Int = 30,
           digits: Int = 6): String =
    hotp(base32Decode(secret), epochMillis / 1000L / stepSeconds, digits)

  /** Verify with a ±window step tolerance (`valid_window=1` in the
    * reference, app.py:799). Comparison is constant-time.
    */
  def verify(secret: String, candidate: String, epochMillis: Long,
             window: Int = 1, stepSeconds: Int = 30,
             digits: Int = 6): Boolean = {
    val key = base32Decode(secret)
    val counter = epochMillis / 1000L / stepSeconds
    (-window to window).exists { w =>
      java.security.MessageDigest.isEqual(
        hotp(key, counter + w, digits).getBytes("US-ASCII"),
        candidate.trim.getBytes("US-ASCII"))
    }
  }

  /** otpauth:// provisioning URI (what the reference renders as a QR,
    * app.py:785; the QR rasterization itself is presentation I/O and
    * stays out of scope).
    */
  def provisioningUri(secret: String, accountName: String,
                      issuer: String): String = {
    def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    s"otpauth://totp/${enc(issuer)}:${enc(accountName)}" +
      s"?secret=$secret&issuer=${enc(issuer)}"
  }
}
