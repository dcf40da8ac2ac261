package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two reference integrations SURVEY scoped driver-side, closed
  * as PLUGGABLE ADAPTERS behind the engine's existing seams (round-11
  * verdict #8): a live geo HTTP client behind the geo-dim seam
  * (reference GeoTracker, app.py:709-731) and SMTP / Twilio SMS
  * transports behind [[graft.export.Report.Notifier]] (reference
  * AlertNotifier, app.py:560-617). Every adapter takes its raw
  * transport as an injectable function with a JDK-only default
  * (HttpURLConnection / java.net.Socket — no new dependencies), so
  * specs drive them against recorded fixtures or in-process fakes
  * with zero live network, and a deployment swaps in nothing more
  * than config.
  */
object Adapters {

  // ------------------------------------------------------------------
  // Geo HTTP client (reference GeoTracker: ip-api.com envelope,
  // per-IP memo cache, loopback short-circuit, Unknown on failure)
  // ------------------------------------------------------------------

  final case class GeoInfo(country: String, city: String, lat: Double,
                           lon: Double, isp: String)

  /** IP → geo lookup seam. The engine only ever consumes this through
    * a bounded DISTINCT-IP dim ([[geoDimOf]]) — per-row lookups stay
    * driver/client-side exactly like the reference's memo cache.
    */
  trait GeoClient extends Serializable {
    def lookup(ip: String): GeoInfo
  }

  /** The reference's GEO_API envelope (app.py:131), parameterized by
    * the raw fetch. Semantics mirrored from GeoTracker.lookup:
    * loopback IPs short-circuit to Local/Loopback, responses memoize
    * per IP, any transport/parse failure degrades to Unknown (the
    * reference catches everything). The envelope is FLAT json with
    * string/number fields, parsed with anchored field extraction —
    * not a general JSON parser, and documented as such.
    */
  final class HttpGeoClient(
      fetch: String => String = Adapters.httpGet(_, timeoutMs = 5000),
      apiUrl: String =
        "http://ip-api.com/json/%s?fields=country,regionName,city,lat,lon,isp,org,query")
      extends GeoClient {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, GeoInfo]()
    private def field(json: String, name: String): Option[String] =
      ("\"" + name + "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|[-0-9.]+)").r
        .findFirstMatchIn(json)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
    override def lookup(ip: String): GeoInfo = {
      if (ip == null || ip.isEmpty ||
        Set("127.0.0.1", "::1", "localhost")(ip))
        return GeoInfo("Local", "Loopback", 0, 0, "N/A")
      val hit = cache.get(ip)
      if (hit != null) return hit
      val info =
        try {
          val json = fetch(apiUrl.format(ip))
          GeoInfo(
            field(json, "country").getOrElse("Unknown"),
            field(json, "city").getOrElse("Unknown"),
            field(json, "lat").map(_.toDouble).getOrElse(0.0),
            field(json, "lon").map(_.toDouble).getOrElse(0.0),
            field(json, "isp").getOrElse("Unknown"))
        } catch {
          case _: Exception => GeoInfo("Unknown", "Unknown", 0, 0, "Unknown")
        }
      cache.put(ip, info)
      info
    }
  }

  /** Live-geo composition at engine scale: the DISTINCT IPs of an
    * activity frame (a bounded dim — the memo-cache working set, not
    * the corpus) resolve through the client driver-side, and the
    * result lands as a broadcastable (ip_address, country) dim. This
    * is [[graft.operators.Analytics.geoTopCountries]]'s static-dim
    * seam fed by a LIVE client instead of the fixture dim.
    *
    * `maxIps` bounds the CALL COUNT and `maxBuildMs` bounds the TIME:
    * lookups run sequentially on the driver (the reference's
    * memo-cached loop), so the count cap alone does NOT bound wall
    * time — 10 000 fresh lookups at the 5 s default client timeout is
    * ~14 h worst case, and even healthy responses at ip-api's stated
    * free-tier ~45 req/min take ~3.7 h. The 10-minute default budget
    * fails LOUDLY mid-build with progress named (the client memoizes,
    * so a retry resumes where it stopped); ~1 200 fresh sub-500 ms
    * lookups fit inside it. Raising either cap is a deliberate
    * choice; a deployment that needs six-figure IP dims should batch
    * them offline into a static dim ([[graft.operators.Analytics
    * .geoRangeDim]] is the production-shaped alternative).
    */
  def geoDimOf(spark: SparkSession, activity: DataFrame,
               client: GeoClient, maxIps: Int = 10000,
               maxBuildMs: Long = 600000): DataFrame = {
    import spark.implicits._
    val ips = activity.select(col("ip_address")).na.drop().distinct()
      .limit(maxIps + 1).as[String].collect()
    require(ips.length <= maxIps,
      s"geoDimOf: > $maxIps distinct IPs — raise maxIps deliberately " +
        "or pre-aggregate; refusing an unbounded HTTP fan-out")
    val deadline = System.currentTimeMillis() + maxBuildMs
    val dim = ips.toSeq.zipWithIndex.map { case (ip, i) =>
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"geoDimOf: time budget ${maxBuildMs} ms exhausted after $i " +
            s"of ${ips.length} lookups — the endpoint is slow or " +
            "rate-limited; retry resumes from the client's memo cache, " +
            "or raise maxBuildMs / pre-build a static dim")
      (ip, client.lookup(ip).country)
    }
    dim.toDF("ip_address", "country")
  }

  /** GeoTracker.get_top_countries over the live dim: count activity
    * rows per resolved country, most_common(k). */
  def geoTopCountriesLive(activity: DataFrame, client: GeoClient,
                          k: Int = 10): DataFrame = {
    val dim = geoDimOf(activity.sparkSession, activity, client)
    activity.filter(col("ip_address").isNotNull)
      .join(broadcast(dim), Seq("ip_address"))
      .groupBy(col("country")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("country"))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // SMTP notifier (reference AlertNotifier.send_email + the
  // dispatch_alert subject/body contract, app.py:560-617)
  // ------------------------------------------------------------------

  /** Reference alert formatting, shared by both transports so the
    * spec can pin the exact wire bytes: subject "[DAM <sev>] <type>",
    * five-line body, SMS = "[DAM <sev>] <description[:120]>". The
    * timestamp is injected (the reference stamps dispatch wall-clock;
    * an injectable clock keeps fixtures byte-stable).
    */
  def alertSubject(severity: String, alertType: String): String =
    s"[DAM $severity] $alertType"
  def alertBody(severity: String, alertType: String, description: String,
                username: String, nowIso: String): String =
    s"Severity   : $severity\n" +
      s"Type       : $alertType\n" +
      s"Description: $description\n" +
      s"User       : $username\n" +
      s"Time       : $nowIso\n"
  def alertSms(severity: String, description: String): String =
    s"[DAM $severity] ${description.take(120)}"

  /** Minimal SMTP client notifier over a caller-supplied socket
    * factory (production passes an SSLSocketFactory-wrapping function
    * for implicit-TLS or a STARTTLS upgrade; the dialogue is the
    * same). Speaks EHLO → AUTH LOGIN → MAIL FROM → RCPT TO → DATA →
    * QUIT and sends the reference's multipart/alternative MIME
    * message (plain + HTML wrapper). JDK sockets only — the spec runs
    * it against an in-process fake SMTP server and asserts the full
    * recorded dialogue; no mail library dependency.
    */
  final class SmtpNotifier(host: String, port: Int, user: String,
                           password: String, recipients: Seq[String],
                           socketFactory: (String, Int) => java.net.Socket =
                             (h, p) => new java.net.Socket(h, p),
                           now: () => String = () =>
                             java.time.LocalDateTime.now().toString)
      extends graft.export.Report.Notifier {
    require(recipients.nonEmpty, "SmtpNotifier: no recipients")

    private def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

    /** The reference's MIME shape: multipart/alternative, text/plain
      * body then the dark-panel HTML wrapper around the same body.
      */
    private[graft] def mimeMessage(subject: String, body: String,
                                   nowIso: String): String = {
      val boundary = "----dam-alert-boundary"
      val html =
        s"""<html><body style="font-family:monospace"><div>
           |<h2>DAM Security Alert</h2>
           |<pre>$body</pre>
           |<p>DAM v3.0 - $nowIso</p>
           |</div></body></html>""".stripMargin
      s"Subject: $subject\r\n" +
        s"From: $user\r\n" +
        s"To: ${recipients.mkString(", ")}\r\n" +
        "MIME-Version: 1.0\r\n" +
        s"""Content-Type: multipart/alternative; boundary="$boundary"\r\n""" +
        "\r\n" +
        s"--$boundary\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
        body + "\r\n" +
        s"--$boundary\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n\r\n" +
        html + "\r\n" +
        s"--$boundary--\r\n"
    }

    /** The exact DATA bytes sent: CRLF-normalized FIRST (the body
      * and HTML templates join with \n; bare LF inside DATA violates
      * RFC 5321 and is rejected outright by modern MTAs — and a line
      * after a bare LF would also escape dot-stuffing), THEN
      * dot-stuffed per RFC 5321 §4.5.2. Exposed for the spec: the
      * fake server's readLine cannot distinguish bare LF from CRLF,
      * so the no-bare-newline property is asserted on these bytes.
      */
    private[graft] def wirePayload(subject: String, body: String,
                                   nowIso: String): String =
      mimeMessage(subject, body, nowIso)
        .replace("\r\n", "\n").replace("\n", "\r\n")
        .split("\r\n", -1).map(l =>
          if (l.startsWith(".")) "." + l else l).mkString("\r\n")

    override def notify(alertType: String, severity: String,
                        description: String): Unit =
      notify(alertType, severity, description, username = "unknown")

    /** The actor-carrying form ([[graft.export.Report.dispatchAlerts]]
      * calls this one): the reference email body renders
      * alert.get('username','unknown') — "unknown" only when the
      * alert carries no actor. */
    override def notify(alertType: String, severity: String,
                        description: String, username: String): Unit = {
      val nowIso = now()
      val subject = alertSubject(severity, alertType)
      val body = alertBody(severity, alertType, description,
        username = username, nowIso = nowIso)
      val sock = socketFactory(host, port)
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        val out = new java.io.PrintWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
        def send(line: String): Unit = { out.print(line + "\r\n"); out.flush() }
        def expect(code: String): Unit = {
          var line = in.readLine()
          // multi-line replies: "250-..." continues, "250 ..." ends
          while (line != null && line.length > 3 && line.charAt(3) == '-')
            line = in.readLine()
          require(line != null && line.startsWith(code),
            s"SMTP: expected $code, got $line")
        }
        expect("220")
        send(s"EHLO graft"); expect("250")
        send("AUTH LOGIN"); expect("334")
        send(b64(user)); expect("334")
        send(b64(password)); expect("235")
        send(s"MAIL FROM:<$user>"); expect("250")
        recipients.foreach { r => send(s"RCPT TO:<$r>"); expect("250") }
        send("DATA"); expect("354")
        val msg = wirePayload(subject, body, nowIso)
        out.print(msg)
        if (!msg.endsWith("\r\n")) out.print("\r\n")
        send("."); expect("250")
        send("QUIT"); expect("221")
      } finally sock.close()
    }
  }

  // ------------------------------------------------------------------
  // Twilio SMS notifier (reference AlertNotifier.send_sms:
  // form-POST per phone, basic auth, 2010-04-01 Messages endpoint)
  // ------------------------------------------------------------------

  /** `post(url, headers, formBody)` → HTTP status. Default is a JDK
    * HttpURLConnection POST; the spec injects a recorder. Failures
    * per phone are caught and counted, not thrown — the reference
    * logs and continues to the next phone.
    */
  final class TwilioSmsNotifier(
      accountSid: String, authToken: String, fromNumber: String,
      phones: Seq[String],
      post: (String, Map[String, String], String) => Int =
        Adapters.httpPostForm(_, _, _, timeoutMs = 10000))
      extends graft.export.Report.Notifier {
    require(phones.nonEmpty, "TwilioSmsNotifier: no phones")

    private[graft] def url: String =
      s"https://api.twilio.com/2010-04-01/Accounts/$accountSid/Messages.json"

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, "UTF-8")

    /** Sends one SMS per configured phone; returns how many posts
      * returned 2xx (exposed for callers that alert on delivery
      * failure — the Notifier interface itself is fire-and-forget).
      */
    private[graft] def send(message: String): Int = {
      val auth = "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$accountSid:$authToken".getBytes("UTF-8"))
      phones.count { phone =>
        val body = s"From=${enc(fromNumber)}&To=${enc(phone)}" +
          s"&Body=${enc(message)}"
        try {
          val status = post(url, Map(
            "Authorization" -> auth,
            "Content-Type" -> "application/x-www-form-urlencoded"), body)
          status >= 200 && status < 300
        } catch { case _: Exception => false }
      }
    }

    override def notify(alertType: String, severity: String,
                        description: String): Unit = {
      send(alertSms(severity, description))
      ()
    }
  }

  /** dispatch_alert's fan-out (app.py:605-617): one alert feeds
    * email + SMS + webhooks; each transport failure is isolated (the
    * reference try/excepts per channel). Compose with
    * [[graft.export.Report.dispatchAlerts]], which already applies
    * the High/Critical severity gate via deriveAlerts.
    */
  final class FanoutNotifier(targets: Seq[graft.export.Report.Notifier])
      extends graft.export.Report.Notifier {
    override def notify(alertType: String, severity: String,
                        description: String): Unit =
      notify(alertType, severity, description, username = "unknown")
    // the actor threads through the fan-out so email transports keep
    // the attribution while SMS-shaped targets drop it in their own
    // 3-arg default
    override def notify(alertType: String, severity: String,
                        description: String, username: String): Unit =
      targets.foreach { t =>
        try t.notify(alertType, severity, description, username)
        catch { case _: Exception => () }
      }
  }

  // ------------------------------------------------------------------
  // JDK-only default transports
  // ------------------------------------------------------------------

  private[graft] def httpGet(url: String, timeoutMs: Int): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    try {
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try src.mkString finally src.close()
    } finally conn.disconnect()
  }

  private[graft] def httpPostForm(url: String, headers: Map[String, String],
                                  body: String, timeoutMs: Int): Int = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setDoOutput(true)
    try {
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
      conn.getResponseCode
    } finally conn.disconnect()
  }
}
