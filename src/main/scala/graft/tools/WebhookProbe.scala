package graft.tools

/** Round-14 measurement: per-POST latency of the webhook leg outside
  * Spark — QueryAnatomy showed webhook_rule_actions spending ~50 s of
  * task time on ~460 loopback POSTs (~108 ms each), which is 100×
  * loopback cost. Times N sequential posts of a realistic 100-line
  * body through the exact sender/receiver pair, then variants, to
  * attribute the stall (client construction, HTTP version negotiation,
  * TCP no-delay).
  */
object WebhookProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val body = (1 to 100).map(i =>
      s"""{"event_id":$i,"user_id":$i,"rule_id":"r1","message":"m$i"}""")
      .mkString("\n")
    val rx = new graft.sources.WebhookReceiver()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      // warm-up
      graft.sources.Webhook.probePost(client, rx.url, "w-0", body)
      var t0 = System.nanoTime()
      (1 to n).foreach { i =>
        graft.sources.Webhook.probePost(client, rx.url, s"a-$i", body)
      }
      println(f"shared-client: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/post")
      t0 = System.nanoTime()
      (1 to n).foreach { i =>
        val c = java.net.http.HttpClient.newHttpClient()
        graft.sources.Webhook.probePost(c, rx.url, s"b-$i", body)
      }
      println(f"client-per-post: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/post")
      val c11 = java.net.http.HttpClient.newBuilder()
        .version(java.net.http.HttpClient.Version.HTTP_1_1).build()
      t0 = System.nanoTime()
      (1 to n).foreach { i =>
        graft.sources.Webhook.probePost(c11, rx.url, s"c-$i", body)
      }
      println(f"http11-client: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/post")
      // variant: HttpURLConnection (single buffered write per request)
      t0 = System.nanoTime()
      (1 to n).foreach { i =>
        val u = java.net.URI.create(rx.url).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        u.setDoOutput(true)
        u.setRequestMethod("POST")
        u.setRequestProperty("Content-Type", "application/x-ndjson")
        u.setRequestProperty("Idempotency-Key", s"d-$i")
        val bytes = body.getBytes("UTF-8")
        u.setFixedLengthStreamingMode(bytes.length)
        val os = u.getOutputStream; os.write(bytes); os.close()
        require(u.getResponseCode == 200)
        u.getInputStream.readAllBytes()
      }
      println(f"urlconnection: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/post")
      // variant: raw keep-alive socket with TCP_NODELAY, one write
      val addr = java.net.URI.create(rx.url)
      val sock = new java.net.Socket(addr.getHost, addr.getPort)
      sock.setTcpNoDelay(true)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      t0 = System.nanoTime()
      (1 to n).foreach { i =>
        val bytes = body.getBytes("UTF-8")
        val hdr = s"POST /hook HTTP/1.1\r\nHost: ${addr.getHost}\r\n" +
          s"Content-Type: application/x-ndjson\r\n" +
          s"Idempotency-Key: e-$i\r\n" +
          s"Content-Length: ${bytes.length}\r\n\r\n"
        out.write(hdr.getBytes("UTF-8")); out.write(bytes); out.flush()
        // read status line + headers + body (Content-Length framing)
        val buf = new java.io.ByteArrayOutputStream()
        var clen = -1
        var line = new StringBuilder
        var headersDone = false
        while (!headersDone) {
          val c = in.read()
          line.append(c.toChar)
          if (line.endsWith("\r\n")) {
            val l = line.toString.trim
            if (l.isEmpty) headersDone = true
            else if (l.toLowerCase.startsWith("content-length:"))
              clen = l.substring(15).trim.toInt
            line = new StringBuilder
          }
        }
        var rem = clen
        while (rem > 0) { in.read(); rem -= 1 }
        buf.size()
      }
      println(f"raw-nodelay-keepalive: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/post")
      sock.close()
    } finally rx.stop()
  }
}
