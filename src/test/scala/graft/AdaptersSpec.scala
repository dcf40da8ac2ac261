package graft

import org.apache.spark.sql.functions._

import graft.sources.Adapters

/** Recorded-fixture specs for the pluggable transport adapters —
  * zero live network: the geo client runs against canned ip-api
  * envelopes, SMTP against an in-process fake server on a loopback
  * socket, Twilio against a recording post function.
  */
class AdaptersSpec extends SparkSpecBase {
  import spark.implicits._

  test("geo client: envelope parse, memo cache, loopback short-circuit, failure degrades to Unknown; live dim feeds top-countries") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val fixtures = Map(
      "10.0.0.1" ->
        """{"country":"United States","regionName":"CA","city":"San Jose","lat":37.33,"lon":-121.89,"isp":"ExampleNet","query":"10.0.0.1"}""",
      "10.0.0.2" ->
        """{"country":"Germany","regionName":"BE","city":"Berlin","lat":52.52,"lon":13.40,"isp":"NetzAG","query":"10.0.0.2"}""")
    val client = new Adapters.HttpGeoClient(fetch = url => {
      calls.incrementAndGet()
      val ip = url.split("/json/")(1).split("\\?")(0)
      fixtures.getOrElse(ip, throw new java.io.IOException("down"))
    })
    val us = client.lookup("10.0.0.1")
    assert(us == Adapters.GeoInfo("United States", "San Jose",
      37.33, -121.89, "ExampleNet"))
    // memoized: a repeat lookup issues no second fetch
    client.lookup("10.0.0.1")
    assert(calls.get() == 1, "memo cache must absorb the repeat")
    // loopback short-circuits without any fetch
    assert(client.lookup("127.0.0.1") ==
      Adapters.GeoInfo("Local", "Loopback", 0, 0, "N/A"))
    assert(calls.get() == 1)
    // transport failure degrades to Unknown (and memoizes it — the
    // reference caches only successes; we cache the miss to bound
    // retries within one dim build, a documented difference)
    assert(client.lookup("10.9.9.9").country == "Unknown")
    // live dim → broadcast join → most_common(k)
    val activity = Seq(
      ("10.0.0.1", 1L), ("10.0.0.1", 2L), ("10.0.0.2", 3L),
      ("127.0.0.1", 4L))
      .toDF("ip_address", "activity_id")
    val top = Adapters.geoTopCountriesLive(activity, client)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("United States", 2L), ("Germany", 1L),
      ("Local", 1L)))
    // unbounded fan-out refused
    val many = (0 until 20).map(i => (s"10.1.0.$i", i.toLong))
      .toDF("ip_address", "activity_id")
    val e = intercept[IllegalArgumentException] {
      Adapters.geoDimOf(spark, many, client, maxIps = 5)
    }
    assert(e.getMessage.contains("distinct IPs"))
  }

  test("smtp notifier: full recorded dialogue against an in-process server — auth, envelope, multipart message, clean quit") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val server = new java.net.ServerSocket(0)
    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 fake.local ESMTP")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        received.add(line)
        if (inData) {
          if (line == ".") { inData = false; reply("250 OK queued") }
        } else line.split(" ")(0).toUpperCase match {
          case "EHLO" => reply("250-fake.local"); reply("250 AUTH LOGIN")
          case "AUTH" => reply("334 VXNlcm5hbWU6")
          case "MAIL" => reply("250 OK")
          case "RCPT" => reply("250 OK")
          case "DATA" => inData = true; reply("354 go")
          case "QUIT" => reply("221 bye"); s.close(); line = null
          case _ =>
            // AUTH LOGIN continuation: first blob = user, second = pass
            if (line == java.util.Base64.getEncoder
                .encodeToString("dam@example.test".getBytes("UTF-8")))
              reply("334 UGFzc3dvcmQ6")
            else reply("235 authed")
        }
        if (line != null) line = in.readLine()
      }
    })
    serverThread.start()
    val n = new Adapters.SmtpNotifier("localhost", server.getLocalPort,
      user = "dam@example.test", password = "s3cret",
      recipients = Seq("soc@example.test", "oncall@example.test"),
      now = () => "2026-08-16T00:00:00")
    n.notify("SQL Injection", "Critical", "union select detected",
      username = "alice")
    serverThread.join(10000)
    server.close()
    val lines = received.toArray(Array.empty[String]).toSeq
    // envelope in order
    assert(lines.head.startsWith("EHLO"))
    assert(lines.contains("AUTH LOGIN"))
    assert(lines.contains("MAIL FROM:<dam@example.test>"))
    assert(lines.contains("RCPT TO:<soc@example.test>"))
    assert(lines.contains("RCPT TO:<oncall@example.test>"))
    assert(lines.contains("DATA") && lines.contains(".") &&
      lines.last == "QUIT")
    // credentials as AUTH LOGIN base64 blobs
    def b64(s: String) = java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8"))
    assert(lines.contains(b64("dam@example.test")))
    assert(lines.contains(b64("s3cret")))
    // the reference's subject/body contract and both MIME parts
    assert(lines.contains("Subject: [DAM Critical] SQL Injection"))
    assert(lines.contains("Severity   : Critical"))
    assert(lines.contains("Description: union select detected"))
    // the actor attribution the reference emails carry
    // (alert.get('username','unknown')) — threaded, not hardcoded
    assert(lines.contains("User       : alice"))
    assert(lines.contains("Time       : 2026-08-16T00:00:00"))
    assert(lines.count(_.startsWith("Content-Type: text/")) == 2,
      "multipart/alternative must carry plain AND html parts")
    // the PRODUCTION wire payload must carry NO bare LF (RFC 5321;
    // modern MTAs reject bare-newline DATA outright, and a line
    // after a bare LF escapes dot-stuffing). The fake server's
    // readLine accepts bare LF, so this is asserted on the exact
    // bytes notify() sends.
    val wire = n.wirePayload("s", "line1\nline2\n.dot", "t")
    assert(!wire.replace("\r\n", "").contains("\n") &&
      !wire.replace("\r\n", "").contains("\r"),
      "wire payload must contain no bare LF/CR")
    assert(wire.contains("\r\n..dot"),
      "a leading-dot line after an LF boundary must be dot-stuffed")
  }

  test("twilio notifier: per-phone form posts with basic auth; failures counted, never thrown; fanout isolates a failing channel") {
    val posts = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, String], String)]
    val n = new Adapters.TwilioSmsNotifier(
      accountSid = "ACxxx", authToken = "tok", fromNumber = "+10000000000",
      phones = Seq("+15550001111", "+15550002222"),
      post = (url, headers, body) => { posts += ((url, headers, body)); 201 })
    val longDesc = "x" * 200
    n.notify("Brute Force", "High", longDesc)
    assert(posts.size == 2)
    posts.foreach { case (url, headers, body) =>
      assert(url ==
        "https://api.twilio.com/2010-04-01/Accounts/ACxxx/Messages.json")
      assert(headers("Authorization") == "Basic " +
        java.util.Base64.getEncoder.encodeToString("ACxxx:tok".getBytes))
      assert(headers("Content-Type") == "application/x-www-form-urlencoded")
      assert(body.startsWith("From=%2B10000000000&To=%2B1555000"))
      // the reference truncates the SMS body at 120 chars
      assert(body.contains("Body=%5BDAM+High%5D+" + "x" * 120) &&
        !body.contains("x" * 121))
    }
    // a failing transport is counted, not thrown
    val flaky = new Adapters.TwilioSmsNotifier("AC", "t", "+1",
      phones = Seq("+15550001111", "+15550002222"),
      post = (_, _, body) =>
        if (body.contains("2222")) throw new java.io.IOException("down")
        else 201)
    assert(flaky.send("hello") == 1)
    // fanout: one throwing channel never blocks the others
    val got = new graft.export.Report.CollectingNotifier
    val fan = new Adapters.FanoutNotifier(Seq(
      new graft.export.Report.Notifier {
        override def notify(t: String, s: String, d: String): Unit =
          throw new IllegalStateException("smtp down")
      }, got))
    fan.notify("T", "High", "d")
    assert(got.sent.size() == 1)
    // the 4-arg actor form fans out too, reaching username-aware
    // targets with the attribution intact
    val users = scala.collection.mutable.ArrayBuffer.empty[String]
    new Adapters.FanoutNotifier(Seq(new graft.export.Report.Notifier {
      override def notify(t: String, s: String, d: String): Unit = ()
      override def notify(t: String, s: String, d: String, u: String): Unit = {
        users += u; ()
      }
    })).notify("T", "High", "d", "bob")
    assert(users.toSeq == Seq("bob"))
  }

  test("geoDimOf: time budget fails loudly mid-build with progress named") {
    val slow = new Adapters.GeoClient {
      override def lookup(ip: String): Adapters.GeoInfo = {
        Thread.sleep(30)
        Adapters.GeoInfo("X", "Y", 0, 0, "Z")
      }
    }
    val activity = (0 until 50).map(i => (s"10.2.0.$i", i.toLong))
      .toDF("ip_address", "activity_id")
    val e = intercept[IllegalStateException] {
      Adapters.geoDimOf(spark, activity, slow, maxBuildMs = 100)
    }
    assert(e.getMessage.contains("time budget") &&
      e.getMessage.contains("of 50 lookups"))
    // a generous budget completes
    assert(Adapters.geoDimOf(spark, activity.limit(3), slow).count() == 3)
  }
}
